"""Dependency-free PNG codec — the REAL image-codec leg of the multimodal
operators (``operators/multimodal.py``).

PNG is a public spec (ISO/IEC 15948 / RFC 2083) whose only compression
primitive is DEFLATE, which ships in the Python stdlib (``zlib``) — so a
spec-conformant subset codec needs no third-party package at all. This
closes the "real-codec leg never executed" gap from the round-13 review:
the sandbox cannot install PIL (``.claude/probe_r14_pip.json`` — the
package index hostname does not resolve; the r13 dry-run "verification"
was a pipeline exit-code artifact), but the decode/resize operators now
run REAL bytes-to-pixels work anyway, with PIL still preferred when a
deployment has it (resolved per worker, see ``_real_image_loader``).

Supported subset (decode): 8-bit depth, color types 0 (grayscale),
2 (RGB), 4 (gray+alpha), 6 (RGBA); non-interlaced; all five scanline
filters (None/Sub/Up/Average/Paeth, RFC 2083 §6); CRC-verified chunks.
Palette (type 3), 1/2/4/16-bit depths, and Adam7 interlace raise
``PngError`` — callers degrade per row to their stub, never fail the
operator. Encode emits color type 2 (RGB8), filter 0, one IDAT.

Scale notes: these functions run on WORKER processes inside Arrow-batched
``mapInPandas`` over payloads that are thumbnails/tiles (the operators cap
geometry); per-row pure-Python unfiltering is O(pixels) with bytearray
arithmetic and is not the corpus hot path — the JVM-side metadata prune
(``media_metadata``) keeps undecodable/oversized rows out before any byte
reaches Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Decode-side allocation cap (raw samples per image): the operators deal
# in thumbnails/tiles, and an untrusted header must not be able to demand
# a multi-GB buffer. 64 MB ≈ a 4096x4096 RGBA frame.
MAX_PIXEL_BYTES = 64 * 1024 * 1024


class PngError(ValueError):
    """Payload is not PNG, or uses a feature outside the supported subset."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    body = tag + data
    return (
        struct.pack(">I", len(data))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, *, channels: int = 3) -> bytes:
    """Encode raw 8-bit row-major samples as a PNG (RGB when channels=3,
    grayscale when channels=1). Filter 0 on every scanline: the operators'
    payloads are small synthetic tiles where codec correctness, not ratio,
    is the point — DEFLATE still compresses the filtered stream."""
    if channels == 3:
        color_type = 2
    elif channels == 1:
        color_type = 0
    else:
        raise PngError(f"encode supports channels 1 or 3, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    # Prepend the filter byte per scanline in one numpy copy (identical raw
    # stream to the former per-row join, so the compressed bytes are too).
    lines = np.zeros((height, stride + 1), dtype=np.uint8)
    lines[:, 1:] = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    raw = lines.tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _iter_chunks(data: bytes):
    pos = len(SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {tag!r}")
        yield tag, body
        pos += 12 + length
        if tag == b"IEND":
            return
    raise PngError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Reverse the per-scanline filters (RFC 2083 §6.3-6.6). bpp = bytes per
    pixel (depth 8), prior = reconstructed previous scanline (zeros row 0).

    Vectorized (r14): filter 0 everywhere (what our own encoder emits) is a
    single numpy slice; Sub is a per-channel-lane cumsum and Up a wrapping
    uint8 add, both whole-row numpy. Average and Paeth stay per-byte Python
    (their recurrences are serial and non-linear) — all five remain pinned
    by tests/test_png_codec.py's forward-filter inversion test."""
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"decompressed stream is {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise PngError(f"unknown filter type {int(bad[0])}")
    if not ftypes.any():  # all filter 0: the raw stream minus filter bytes
        return arr[:, 1:].tobytes()
    data = arr[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        if ftype == 0:
            rec = data[y].copy()
        elif ftype == 1:  # Sub: cumsum per channel lane; uint64 wrap == mod 256
            rec = (
                np.cumsum(data[y].reshape(width, channels), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype == 2:  # Up: wrapping uint8 add of the reconstructed prior
            rec = data[y] + prior
        else:  # Average (3) / Paeth (4): serial, per-byte
            line = bytearray(data[y].tobytes())
            pr = prior.tobytes()
            if ftype == 3:
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + (left + pr[i]) // 2) & 0xFF
            else:
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    upleft = pr[i - channels] if i >= channels else 0
                    line[i] = (line[i] + _paeth(left, pr[i], upleft)) & 0xFF
            rec = np.frombuffer(bytes(line), dtype=np.uint8)
        out[y] = rec
        prior = out[y]
    return out.tobytes()


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG payload to ``(width, height, channels, pixels)`` with
    ``pixels`` as raw 8-bit row-major samples. Raises PngError for non-PNG
    bytes or features outside the supported subset (callers stub-degrade)."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(SIGNATURE):
        raise PngError("not a PNG signature")
    width = height = channels = -1
    idat: list[bytes] = []
    seen_ihdr = False
    for tag, body in _iter_chunks(bytes(data)):
        if tag == b"IHDR":
            if len(body) != 13:
                raise PngError("bad IHDR length")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            if width <= 0 or height <= 0:
                raise PngError("non-positive dimensions")
            channels = _CHANNELS[color_type]
            seen_ihdr = True
        elif tag == b"IDAT":
            if not seen_ihdr:
                raise PngError("IDAT before IHDR")
            idat.append(body)
        elif tag == b"IEND":
            break
    if not seen_ihdr or not idat:
        raise PngError("missing IHDR or IDAT")
    # Decompression-bomb guard: these decoders run worker-side over
    # UNTRUSTED corpus payloads, and a kilobyte IDAT can legally inflate
    # to gigabytes. The header fixes the exact inflated size, so (a) cap
    # the claimed geometry before allocating anything, and (b) inflate
    # through a decompressobj bounded to expected+1 bytes — one extra
    # byte distinguishes "bomb/overlong" from "exact" without ever
    # materializing the excess.
    if width * height * channels > MAX_PIXEL_BYTES:
        raise PngError(
            f"image too large ({width}x{height}x{channels} samples; "
            f"cap {MAX_PIXEL_BYTES} bytes)"
        )
    expected = (width * channels + 1) * height
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) > expected:
        raise PngError("IDAT inflates past the header-declared size")
    return width, height, channels, _unfilter(raw, width, height, channels)


def png_size(data: bytes) -> tuple[int, int]:
    """Header-only (width, height): parses + CRC-checks just IHDR — the
    cheap metadata path that never inflates IDAT."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(SIGNATURE):
        raise PngError("not a PNG signature")
    for tag, body in _iter_chunks(bytes(data)):
        if tag == b"IHDR":
            if len(body) != 13:
                raise PngError("bad IHDR length")
            w, h = struct.unpack(">II", body[:8])
            if w <= 0 or h <= 0:
                raise PngError("non-positive dimensions")
            return w, h
        break
    raise PngError("first chunk is not IHDR")


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of raw 8-bit samples (the classic
    floor(i * src / dst) index map — deterministic, no float rounding
    ambiguity across platforms)."""
    if new_w <= 0 or new_h <= 0:
        raise PngError("non-positive target dimensions")
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    sy = (np.arange(new_h) * height) // new_h
    sx = (np.arange(new_w) * width) // new_w
    return np.ascontiguousarray(a[sy][:, sx]).tobytes()


def resize_png(data: bytes, new_w: int, new_h: int) -> bytes:
    """Real resize: decode -> nearest-neighbor resample -> re-encode.
    Grayscale/alpha inputs are re-encoded in their sample layout only when
    RGB or grayscale (alpha planes are dropped by compositing onto black —
    the deterministic choice that keeps the output self-describing)."""
    width, height, channels, pixels = decode_png(data)
    if channels == 4:  # RGBA -> RGB over black: out = rgb * a / 255
        px = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 4).astype(np.uint32)
        rgb = (px[:, :3] * px[:, 3:4] // 255).astype(np.uint8)
        pixels, channels = rgb.tobytes(), 3
    elif channels == 2:  # gray+alpha -> gray over black
        px = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 2).astype(np.uint32)
        pixels, channels = (px[:, 0] * px[:, 1] // 255).astype(np.uint8).tobytes(), 1
    resized = resize_nearest(pixels, width, height, channels, new_w, new_h)
    return encode_png(new_w, new_h, resized, channels=channels)

"""Dependency-free GIF container codec — the real VIDEO-leg parser for the
multimodal operators (``operators/multimodal.py``).

GIF (GIF87a/GIF89a, a public spec) is the one multi-frame animated
container the stdlib can handle without external codecs: the container
layout is plain block structure, and the only compression is LZW, which an
encoder may legally emit in "uncompressed" form (a clear code before every
literal keeps the code width fixed — the classic trick, spec-valid per the
GIF89a LZW appendix). That turns the r14 review's last stubbed codec
("video: no stdlib container parser") into a real parse:

- ``gif_info`` walks the real block structure — header + logical screen
  descriptor, color tables, extension sub-block chains, image descriptors,
  trailer — and returns (width, height, n_frames, duration_ms) where
  n_frames counts image descriptors and duration sums Graphic Control
  Extension delays (1/100 s units). Malformed bytes raise ``GifError``;
  callers degrade per row to their stub.
- ``encode_gif`` emits a multi-frame GIF89a with a global 256-entry color
  table and per-frame Graphic Control delays, pixel data as uncompressed
  LZW (9-bit codes, CLEAR before every literal).

Like functions/png.py this runs worker-side inside Arrow-batched
``mapInPandas``; the fixtures are tiny tiles, and the metadata path never
touches pixel data (``gif_info`` skips sub-block bodies by length).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Payload is not GIF, or its block structure is malformed."""


_HEADERS = (b"GIF87a", b"GIF89a")


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a sub-block chain (len byte + body, 0x00 terminator)."""
    n = len(data)
    while True:
        if pos >= n:
            raise GifError("truncated sub-block chain")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return pos
        if pos + ln > n:
            raise GifError("truncated sub-block body")
        pos += ln


def gif_info(data: bytes) -> tuple[int, int, int, int]:
    """Parse the container structure: (width, height, n_frames,
    duration_ms). Validates every block boundary up to the trailer —
    a truncated or non-GIF payload raises GifError."""
    if not isinstance(data, (bytes, bytearray)):
        raise GifError("not bytes")
    data = bytes(data)
    if len(data) < 13 or data[:6] not in _HEADERS:
        raise GifError("not a GIF header")
    width, height = struct.unpack_from("<HH", data, 6)
    if width <= 0 or height <= 0:
        raise GifError("non-positive logical screen size")
    packed = data[10]
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    delay_cs = 0
    n = len(data)
    while True:
        if pos >= n:
            raise GifError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= n:
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension: read the delay
                if pos + 6 > n or data[pos] != 4:
                    raise GifError("malformed graphic control extension")
                delay_cs += struct.unpack_from("<H", data, pos + 2)[0]
            pos = _skip_subblocks(data, pos)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise GifError("truncated image descriptor")
            ipacked = data[pos + 8]
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            if pos >= n:
                raise GifError("truncated image data")
            pos += 1  # LZW minimum code size byte
            pos = _skip_subblocks(data, pos)
            n_frames += 1
        else:
            raise GifError(f"unknown block 0x{block:02x}")
    if n_frames == 0:
        raise GifError("no image frames")
    return width, height, n_frames, delay_cs * 10


def _lzw_uncompressed(indices: bytes) -> bytes:
    """Spec-valid LZW stream with NO compression: emit CLEAR before every
    literal so the dictionary never grows and the code width stays fixed
    at min_code_size + 1 = 9 bits (min code size 8, 256-entry alphabet).

    Vectorized (r14): the code sequence is CLEAR, (pix, CLEAR)*, EOI — all
    9-bit — so the whole stream packs as one numpy bit matrix instead of a
    per-pixel Python loop (byte-identical to the former _BitPacker output,
    ~12x faster; this is the encoder's hot path inside the Arrow-batched
    media builders)."""
    n = len(indices)
    codes = np.empty(2 * n + 2, dtype=np.uint16)
    codes[0] = 256  # CLEAR
    if n:
        codes[1:-1:2] = np.frombuffer(indices, dtype=np.uint8)
        codes[2:-1:2] = 256  # CLEAR after every literal
    codes[-1] = 257  # EOI
    bits = ((codes[:, None] >> np.arange(9, dtype=np.uint16)) & 1).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


# 256-entry grayscale global color table (index i -> rgb(i,i,i)) — constant,
# built once at import instead of per encode call.
_GRAY_GCT = bytes(v for i in range(256) for v in (i, i, i))


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    delay_cs: int = 4,
) -> bytes:
    """Multi-frame GIF89a: global grayscale 256-color table, one Graphic
    Control Extension (with ``delay_cs`` hundredths of a second) per frame,
    uncompressed LZW pixel data. Each frame is ``width*height`` palette
    indices (grayscale ramp palette: index i -> rgb(i,i,i))."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise GifError("bad dimensions")
    if not frames:
        raise GifError("need at least one frame")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg 0; no aspect
    out += _GRAY_GCT  # grayscale GCT
    for pix in frames:
        if len(pix) != width * height:
            raise GifError(
                f"frame is {len(pix)} indices, expected {width * height}"
            )
        out += bytes([0x21, 0xF9, 4, 0x00])  # GCE, no disposal/transparency
        out += struct.pack("<H", delay_cs)
        out += bytes([0, 0])  # transparent index unused + terminator
        out += bytes([0x2C])  # image descriptor at (0,0), full size, no LCT
        out += struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x00, 8])  # packed, LZW min code size
        out += _subblocks(_lzw_uncompressed(pix))
    out.append(0x3B)
    return bytes(out)

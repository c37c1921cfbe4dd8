"""functions/gif.py — the real video-container leg (r14).

Evidence mirrors test_png_codec.py's three legs: (1) structure round-trips
through gif_info, (2) an EXTERNALLY-produced fixture (the canonical base64
1x1 GIF that circulates verbatim across the web), (3) the encoder's
"uncompressed" LZW streams decoded by an INDEPENDENT LZW decoder written
in this test from the GIF89a algorithm — the encoder must produce the
exact pixel indices back."""

import base64
import struct

import pytest

from vector_db_mvp_spark.functions.gif import (
    GifError,
    encode_gif,
    gif_info,
)

# Externally-created fixture: the widely-published 1x1 GIF.
KNOWN_1X1 = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_known_external_fixture_parses():
    w, h, n_frames, duration_ms = gif_info(KNOWN_1X1)
    assert (w, h, n_frames) == (1, 1, 1)
    assert duration_ms == 0  # the canonical fixture has delay 0


def test_multiframe_structure_roundtrip():
    frames = [bytes((i * 37 + f * 11) % 256 for i in range(6 * 4))
              for f in range(3)]
    data = encode_gif(6, 4, frames, delay_cs=7)
    assert data.startswith(b"GIF89a") and data.endswith(b"\x3b")
    w, h, n_frames, duration_ms = gif_info(data)
    assert (w, h, n_frames) == (6, 4, 3)
    assert duration_ms == 3 * 7 * 10  # per-frame delay summed, cs -> ms


def _lzw_decode(stream: bytes, min_code_size: int, expected: int) -> bytes:
    """Independent GIF-LZW decoder (GIF89a appendix algorithm), LSB-first
    bit order — used only to VERIFY encode_gif's pixel streams."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1

    def reset():
        return {i: bytes([i]) for i in range(1 << min_code_size)}, min_code_size + 1

    table, width = reset()
    out, prev = bytearray(), None
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(stream):
                raise AssertionError("stream ended before EOI")
            acc |= stream[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:
            entry = prev + prev[:1]
        else:
            raise AssertionError(f"bad code {code}")
        out += entry
        if prev is not None:
            table[len(table) + 2] = prev + entry[:1]
            if len(table) + 2 == (1 << width) and width < 12:
                width += 1
        prev = entry
    assert len(out) == expected
    return bytes(out)


def test_encoder_lzw_stream_decodes_to_exact_pixels():
    w, h = 5, 3
    frames = [bytes((i * 13 + f * 101) % 256 for i in range(w * h))
              for f in range(2)]
    data = encode_gif(w, h, frames, delay_cs=2)
    # walk to each image's sub-block chain and reassemble the LZW stream
    pos = 13 + 3 * 256  # header + LSD + 256-entry GCT
    seen = []
    while data[pos] != 0x3B:
        if data[pos] == 0x21:
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif data[pos] == 0x2C:
            pos += 10
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos]:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            seen.append(_lzw_decode(bytes(stream), min_code, w * h))
        else:
            raise AssertionError(f"unexpected block {data[pos]:#x}")
    assert seen == frames


def test_rejections():
    good = encode_gif(2, 2, [bytes(4)])
    with pytest.raises(GifError):
        gif_info(b"JIF89a definitely not")
    with pytest.raises(GifError):
        gif_info(good[:-2])  # trailer cut off
    with pytest.raises(GifError):
        gif_info(good[:6] + struct.pack("<HH", 0, 5) + good[10:])  # w=0
    # a GIF with zero image descriptors is structurally empty
    empty = good[: 13 + 3 * 256] + b"\x3b"
    with pytest.raises(GifError):
        gif_info(empty)
    with pytest.raises(GifError):
        encode_gif(2, 2, [bytes(3)])  # wrong frame size
    with pytest.raises(GifError):
        encode_gif(2, 2, [])


def test_property_structure_roundtrip_and_fail_closed():
    """Property sweep: encode->gif_info round-trips every geometry /
    frame-count / delay combination, and arbitrary bytes fail CLOSED
    with GifError only (gif_info never inflates, so no bomb surface —
    it walks sub-block lengths)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=15),
        nf=st.integers(min_value=1, max_value=6),
        delay=st.integers(min_value=0, max_value=300),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def roundtrip(w, h, nf, delay, seed):
        frames = [
            bytes((i * 97 + f * 13 + seed) % 256 for i in range(w * h))
            for f in range(nf)
        ]
        data = encode_gif(w, h, frames, delay_cs=delay)
        assert gif_info(data) == (w, h, nf, nf * delay * 10)

    roundtrip()

    @settings(max_examples=60, deadline=None)
    @given(data=st.binary(max_size=400))
    def fail_closed(data):
        for payload in (data, b"GIF89a" + data):
            try:
                gif_info(payload)
            except GifError:
                pass

    fail_closed()

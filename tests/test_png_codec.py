"""functions/png.py — the dependency-free real-codec leg (r14).

Conformance evidence is three-legged: (1) encode->decode round-trips,
(2) an EXTERNALLY-produced fixture (the canonical base64 1x1 transparent
PNG that circulates verbatim across the web — our encoder never touched
it), (3) hand-forward-filtered streams for ALL FIVE scanline filters
(RFC 2083 §6), built in the test with an independent forward
implementation the codec must invert."""

import base64
import struct
import zlib

import pytest

from vector_db_mvp_spark.functions.png import (
    SIGNATURE,
    PngError,
    _chunk,
    decode_png,
    encode_png,
    png_size,
    resize_nearest,
    resize_png,
)

# Externally-created fixture: the widely-published 1x1 transparent PNG.
KNOWN_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def _gradient(w, h, ch=3):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_roundtrip_rgb_and_gray():
    for ch in (3, 1):
        pix = _gradient(6, 4, ch)
        data = encode_png(6, 4, pix, channels=ch)
        assert data.startswith(SIGNATURE)
        w, h, channels, out = decode_png(data)
        assert (w, h, channels) == (6, 4, ch)
        assert out == pix
        assert png_size(data) == (6, 4)


def test_known_external_fixture_decodes():
    w, h, ch, pix = decode_png(KNOWN_1X1)
    assert (w, h, ch) == (1, 1, 4)  # RGBA
    assert len(pix) == 4
    assert pix[3] != 255  # the famous pixel is (semi-)transparent
    assert png_size(KNOWN_1X1) == (1, 1)


def _forward_filter(ftype, line, prior, bpp):
    """Independent forward filter (RFC 2083 §6.2-6.6) used only to BUILD
    test streams; the codec's _unfilter must invert it exactly."""
    res = bytearray(line)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for i in range(len(line)):
        left = line[i - bpp] if i >= bpp else 0
        ul = prior[i - bpp] if i >= bpp else 0
        if ftype == 1:
            res[i] = (line[i] - left) & 0xFF
        elif ftype == 2:
            res[i] = (line[i] - prior[i]) & 0xFF
        elif ftype == 3:
            res[i] = (line[i] - (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:
            res[i] = (line[i] - paeth(left, prior[i], ul)) & 0xFF
    return bytes(res)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_five_scanline_filters_invert(ftype):
    w, h, ch = 6, 5, 3
    stride = w * ch
    pix = bytes((x * 31 + y * 57 + c * 11) % 256
                for y in range(h) for x in range(w) for c in range(ch))
    raw, prior = b"", bytes(stride)
    for y in range(h):
        line = pix[y * stride:(y + 1) * stride]
        raw += bytes([ftype]) + _forward_filter(ftype, line, prior, ch)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    assert decode_png(data)[3] == pix


def test_resize_nearest_index_map():
    # 4x4 -> 2x2 nearest keeps pixels at source (0,0),(2,0),(0,2),(2,2)
    pix = bytes(range(48))
    out = resize_nearest(pix, 4, 4, 3, 2, 2)
    expect = b"".join(
        pix[(sy * 4 + sx) * 3:(sy * 4 + sx) * 3 + 3]
        for sy in (0, 2) for sx in (0, 2)
    )
    assert out == expect


def test_resize_png_roundtrip():
    data = encode_png(8, 6, _gradient(8, 6))
    out = resize_png(data, 3, 2)
    w, h, ch, pix = decode_png(out)
    assert (w, h, ch) == (3, 2, 3)
    # corner = source pixel (2*8//3, 1*6//2) = (5, 3)
    src = _gradient(8, 6)
    off = (3 * 8 + 5) * 3
    assert pix[-3:] == src[off:off + 3]


def test_rgba_resize_composites_alpha():
    # alpha=0 pixel must come out black after RGBA->RGB compositing
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    raw = b"\x00" + bytes([200, 100, 50, 0])
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    w, h, ch, pix = decode_png(resize_png(data, 2, 2))
    assert (ch, set(pix)) == (3, {0})


def test_rejections():
    good = encode_png(2, 2, _gradient(2, 2))
    with pytest.raises(PngError):
        decode_png(b"not a png at all")
    with pytest.raises(PngError):
        decode_png(good[:-5])  # truncated IEND
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    with pytest.raises(PngError):
        decode_png(bytes(corrupted))
    # interlaced flag -> unsupported (rebuild IHDR with interlace=1)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    data = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError):
        decode_png(data)
    with pytest.raises(PngError):
        encode_png(2, 2, b"short")


def test_decompression_bomb_and_giant_header_rejected():
    """Worker-side decode over untrusted payloads: a header demanding a
    multi-GB buffer and an IDAT inflating past the header-declared size
    must both raise PngError without materializing the excess."""
    # giant claimed geometry, tiny actual data
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 6, 0, 0, 0)
    bomb = (SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="too large"):
        decode_png(bomb)
    # sane 2x2 header, IDAT that inflates to far more than declared
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    overlong = (SIGNATURE + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
                + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="inflates past"):
        decode_png(overlong)


def test_property_roundtrip_random_geometry():
    """Property sweep: encode->decode is the identity for every geometry
    and payload (hypothesis drives dims and a pixel seed)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(w, h, ch, seed):
        pix = bytes((i * 2654435761 + seed) % 256 for i in range(w * h * ch))
        got = decode_png(encode_png(w, h, pix, channels=ch))
        assert got == (w, h, ch, pix)

    check()


def test_property_garbage_never_raises_non_pngerror():
    """Arbitrary bytes must fail CLOSED: PngError only, never struct
    errors / overflows — the per-row stub fallback catches Exception, but
    the codec's contract is the typed error."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(data=st.binary(max_size=400))
    def check(data):
        for payload in (data, SIGNATURE + data):
            try:
                decode_png(payload)
            except PngError:
                pass

    check()

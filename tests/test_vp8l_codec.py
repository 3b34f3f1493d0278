"""VP8L codec suite: encoder<->decoder round-trips over every
transform/cache/LZ77 path, plus INDEPENDENT hand-packed bitstream
fixtures (built bit-by-bit in the test from the RFC 9649 layout, not
via the encoder) so a shared encoder/decoder misreading of the spec
cannot self-certify — the same discipline as the JPEG/PNG/GIF
hand-derived fixtures."""

import numpy as np
import pytest

from parquet_to_sql_spark.operators.vp8l import (
    _DISTANCE_MAP,
    _avg2,
    _clamp_add_subtract_full,
    _clamp_add_subtract_half,
    _ct_delta,
    _predict,
    vp8l_decode,
    vp8l_encode,
    webp_decode,
    webp_wrap_vp8l,
)
from parquet_to_sql_spark.operators.webp import (
    WebpFormatError,
    webp_dimensions,
)


class _Pack:
    """Independent LSB-first bit packer (NOT the module's writer)."""

    def __init__(self):
        self.bits = []

    def w(self, value, n):  # LSB-first field
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def c(self, code, n):  # prefix code, MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def test_hand_packed_literal_stream_decodes_exactly():
    """2x2, no transforms/cache/meta: simple 2-symbol green code,
    zero-bit red/blue/alpha/distance codes — every bit laid down by
    hand from the spec."""
    p = _Pack()
    p.w(1, 14)  # w-1
    p.w(1, 14)  # h-1
    p.w(0, 1)   # alpha hint
    p.w(0, 3)   # version
    p.w(0, 1)   # no transforms
    p.w(0, 1)   # no color cache
    p.w(0, 1)   # no meta-prefix image
    # green: simple, two 8-bit symbols 5 and 9 -> codes 0 and 1
    p.w(1, 1); p.w(1, 1); p.w(1, 1); p.w(5, 8); p.w(9, 8)
    # red / blue / alpha: simple single 8-bit symbols (zero-bit codes)
    for v in (77, 200, 255):
        p.w(1, 1); p.w(0, 1); p.w(1, 1); p.w(v, 8)
    # distance: simple single 1-bit-form symbol 0
    p.w(1, 1); p.w(0, 1); p.w(0, 1); p.w(0, 1)
    # pixel greens: 5, 9, 9, 5 -> codes 0, 1, 1, 0
    for bit in (0, 1, 1, 0):
        p.c(bit, 1)
    w, h, c, out = vp8l_decode(b"\x2f" + p.bytes())
    assert (w, h, c) == (2, 2, 4)
    px = np.frombuffer(out, np.uint8).reshape(4, 4)
    assert [tuple(r) for r in px] == [
        (77, 5, 200, 255), (77, 9, 200, 255),
        (77, 9, 200, 255), (77, 5, 200, 255),
    ]


def test_hand_packed_lz77_distance_map_and_cl_repeats():
    """2x2 with a backward reference through 2D distance-map entry 1
    ((0,1) -> the row above) and a green code delivered through the
    NORMAL path: code-length code with 17/18 zero-repeats, canonical
    assignment, and a length-prefix symbol — all hand-packed."""
    p = _Pack()
    p.w(1, 14); p.w(1, 14); p.w(0, 1); p.w(0, 3)
    p.w(0, 1); p.w(0, 1); p.w(0, 1)
    # green code, normal form: used symbols {5: len 1, 257: len 1}
    p.w(0, 1)       # not simple
    p.w(15, 4)      # 19 code-length slots
    # 3-bit CL lengths in order 17,18,0,1,2..16: 17->2,18->2,0->2,1->2
    for v in (2, 2, 2, 2) + (0,) * 15:
        p.w(v, 3)
    p.w(0, 1)       # no max-symbol shortcut
    # canonical CL codes: 0->00, 1->01, 17->10, 18->11
    p.c(0b10, 2); p.w(2, 3)      # 17: repeat 0 x(3+2)=5  (symbols 0-4)
    p.c(0b01, 2)                 # symbol 5 gets length 1
    p.c(0b11, 2); p.w(127, 7)    # 18: repeat 0 x138 (symbols 6-143)
    p.c(0b11, 2); p.w(102, 7)    # 18: repeat 0 x113 (symbols 144-256)
    p.c(0b01, 2)                 # symbol 257 gets length 1
    p.c(0b11, 2); p.w(11, 7)     # 18: repeat 0 x22 (symbols 258-279)
    # red/blue/alpha: simple single symbols
    for v in (77, 200, 255):
        p.w(1, 1); p.w(0, 1); p.w(1, 1); p.w(v, 8)
    # distance: simple single symbol 0 (zero-bit)
    p.w(1, 1); p.w(0, 1); p.w(0, 1); p.w(0, 1)
    # data: lit g5, lit g5, then length-2 copy (green sym 257 ->
    # prefix sym 1 -> value 2, no extra; distance sym 0 -> dcode 1 ->
    # map entry (0,1) -> dist = 0 + 1*xsize = 2)
    p.c(0, 1)  # green 5 (canonical: 5 -> code 0, 257 -> code 1)
    p.c(0, 1)
    p.c(1, 1)
    w, h, c, out = vp8l_decode(b"\x2f" + p.bytes())
    assert (w, h, c) == (2, 2, 4)
    assert out == bytes((77, 5, 200, 255)) * 4


def test_distance_map_properties():
    """Structural pins on the 120-entry 2D map: all entries
    distinct, y in 0..7 with x in -7..8 (plus the x=8 row), sorted
    by non-decreasing euclidean distance from the origin, and the
    near neighbors in their spec positions."""
    assert len(_DISTANCE_MAP) == 120
    assert len(set(_DISTANCE_MAP)) == 120
    norms = [x * x + y * y for x, y in _DISTANCE_MAP]
    assert norms == sorted(norms)
    assert _DISTANCE_MAP[0] == (0, 1)   # directly above
    assert _DISTANCE_MAP[1] == (1, 0)   # directly left
    assert all(0 <= y <= 7 and -7 <= x <= 8 for x, y in _DISTANCE_MAP)


def test_predictor_arithmetic_unit_vectors():
    """Hand-computed spec vectors for the non-trivial predictor
    modes (packed-ARGB average parity trick, Select's Manhattan
    choice, clamp-add-subtract full/half truncation)."""
    def px(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    # avg2 is per-channel floor((x+y)/2)
    assert _avg2(px(255, 10, 11, 200), px(255, 13, 12, 201)) == px(
        255, 11, 11, 200
    )
    # full: clamp(l + t - tl) per channel
    assert _clamp_add_subtract_full(
        px(255, 200, 0, 0), px(255, 100, 0, 255), px(255, 50, 0, 255)
    ) == px(255, 250, 0, 0)
    assert _clamp_add_subtract_full(
        px(255, 200, 0, 0), px(255, 200, 0, 0), px(255, 10, 0, 0)
    ) == px(255, 255, 0, 0)  # 390 clamps
    # half: a + trunc((a - b) / 2) — C truncation toward zero
    assert _clamp_add_subtract_half(px(0, 0, 0, 151), px(0, 0, 0, 200)) == px(
        0, 0, 0, 151 - 24
    )
    assert _clamp_add_subtract_half(px(0, 0, 0, 150), px(0, 0, 0, 200)) == px(
        0, 0, 0, 125
    )
    # select: Manhattan over all four channels
    l, t, tl = px(255, 100, 50, 0), px(255, 98, 52, 0), px(255, 99, 51, 0)
    # p = l + t - tl = (255, 99, 51, 0); |p-l| = 1+1, |p-t| = 1+1 ->
    # tie prefers L
    assert _predict(11, l, t, tl, 0) == l
    tl2 = px(255, 100, 50, 0)  # p == t now: |p-t| = 0 -> T wins
    assert _predict(11, l, t, tl2, 0) == t


def test_color_transform_delta_signedness():
    """3.5 fixed point with BOTH operands as signed int8 and an
    arithmetic (floor) shift."""
    assert _ct_delta(200, 100) == (-56 * 100) >> 5      # -175
    assert _ct_delta(200, 99) == -174                   # floor(-173.25)
    assert _ct_delta(100, 200) == (100 * -56) >> 5      # symmetric signs
    assert _ct_delta(16, 16) == 8


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"transforms": ("subtract_green",)},
        {"transforms": ("predictor",), "predictor_bits": 2},
        {"transforms": ("color",), "color_bits": 2},
        {"transforms": ("subtract_green", "color", "predictor"),
         "predictor_bits": 3, "color_bits": 3},
        {"cache_bits": 6},
        {"transforms": ("subtract_green",), "cache_bits": 4},
    ],
)
def test_roundtrip_random(kw):
    """Bit-exact encode->decode across every transform/cache
    combination on random RGBA (37x29 cycles all 14 predictor modes
    at 4-pixel blocks)."""
    rng = np.random.RandomState(7)
    w, h = 37, 29
    rgba = rng.randint(0, 256, w * h * 4).astype(np.uint8).tobytes()
    payload = vp8l_encode(w, h, rgba, **kw)
    assert vp8l_decode(payload) == (w, h, 4, rgba)


@pytest.mark.parametrize("ncol", [2, 4, 12, 100, 256])
def test_roundtrip_palette_all_bundle_widths(ncol):
    """Color-indexing round-trips at every sub-byte bundling width
    (8/4/2/1 indices per green byte) including the unbundled 256
    case; delta-coded palette reconstruction is exact."""
    rng = np.random.RandomState(ncol)
    w, h = 23, 11
    pal = rng.randint(0, 256, (ncol, 4)).astype(np.uint8)
    rgba = pal[rng.randint(0, ncol, w * h)].tobytes()
    payload = vp8l_encode(w, h, rgba, transforms=("palette",))
    assert vp8l_decode(payload) == (w, h, 4, rgba)


def test_lz77_runs_and_row_copies():
    """Repetitive content exercises dist-1 and dist-row backward
    references with lengths beyond one extra-bits bucket."""
    w, h = 64, 16
    row = bytes(range(64)) * 4  # 64 px of varied RGBA
    rgba = row * h              # identical rows -> dist-row copies
    payload = vp8l_encode(w, h, rgba)
    assert vp8l_decode(payload) == (w, h, 4, rgba)
    assert len(payload) < len(rgba) // 8  # actually compressed


def test_probe_and_decoder_agree_and_container_walk():
    """webp_dimensions and the full decoder report identical dims;
    the container walk reaches VP8L and quarantines lossy VP8."""
    rng = np.random.RandomState(1)
    w, h = 19, 13
    rgba = rng.randint(0, 256, w * h * 4).astype(np.uint8).tobytes()
    container = webp_wrap_vp8l(vp8l_encode(w, h, rgba))
    assert webp_dimensions(container)[:2] == (w, h)
    assert webp_decode(container) == (w, h, 4, rgba)
    # real-world lossy file on this host: probe works, decode
    # quarantines with the documented typed error
    import os

    real = (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
        "test_email/data/python.webp"
    )
    if os.path.exists(real):
        data = open(real, "rb").read()
        assert webp_dimensions(data) == (16, 16, 4)
        with pytest.raises(WebpFormatError, match="lossy VP8"):
            webp_decode(data)


def test_decoder_quarantines_are_typed():
    """Malformed streams raise WebpFormatError naming the reason."""
    rng = np.random.RandomState(2)
    rgba = rng.randint(0, 256, 8 * 8 * 4).astype(np.uint8).tobytes()
    good = vp8l_encode(8, 8, rgba)
    with pytest.raises(WebpFormatError, match="signature"):
        vp8l_decode(b"\x30" + good[1:])
    with pytest.raises(WebpFormatError, match="truncated"):
        vp8l_decode(good[: len(good) // 2])
    # version != 0 (bits 28-30 of the first header word after 0x2f)
    bad = bytearray(good)
    bad[4] |= 0x80  # bit 31 of LE word = last version bit? -> compute:
    # header bits: 14+14 dims = bits 0..27, alpha bit 28, version 29-31
    bad = bytearray(good)
    bad[4] |= 0x20  # bit 29 set -> version lsb
    with pytest.raises(WebpFormatError, match="version"):
        vp8l_decode(bytes(bad))

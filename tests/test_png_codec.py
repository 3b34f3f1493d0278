"""Golden + property tests for the pure-stdlib PNG codec
(operators/png.py) — the real decoder path behind
decode_image_features(fake=False) (VERDICT r08 #2).

No Spark needed here: the codec is plain bytes-in/bytes-out.  The
Spark-side end-to-end tests (mapInPandas/mapInArrow, on_error
routing) live in tests/test_operators.py.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_sql_spark.operators.png import (
    PngFormatError,
    png_decode,
    png_encode,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_built_png(
    w=2, h=2, depth=8, color=2, interlace=0, rows=None, extra_chunks=()
) -> bytes:
    """Build a PNG byte-by-byte WITHOUT the encoder under test, so
    decoder correctness is proven against the spec layout, not
    against the sibling implementation."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    if rows is None:
        nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color, 3)
        rows = [bytes([0]) + bytes(range(1, w * nch + 1)) for _ in range(h)]
    idat = zlib.compress(b"".join(rows))
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    for ctype, body in extra_chunks:
        out += _chunk(ctype, body)
    return out + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def test_decode_hand_built_golden_rgb():
    """A 2x2 RGB PNG assembled by hand (filter 0 rows): the decoder
    must return exactly the scanline bytes that went in."""
    row1 = bytes([0]) + bytes([10, 20, 30, 40, 50, 60])
    row2 = bytes([0]) + bytes([70, 80, 90, 100, 110, 120])
    data = _hand_built_png(w=2, h=2, color=2, rows=[row1, row2])
    w, h, c, px = png_decode(data)
    assert (w, h, c) == (2, 2, 3)
    assert px == bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])


def test_decode_hand_built_sub_filter():
    """Filter 1 (Sub) reconstruction: raw deltas accumulate across the
    row with the channel-count lookback."""
    # 3 RGB pixels: raw = [5,6,7, 1,1,1, 2,2,2] under Sub means
    # reconstructed = [5,6,7, 6,7,8, 8,9,10]
    row = bytes([1]) + bytes([5, 6, 7, 1, 1, 1, 2, 2, 2])
    data = _hand_built_png(w=3, h=1, color=2, rows=[row])
    _, _, _, px = png_decode(data)
    assert px == bytes([5, 6, 7, 6, 7, 8, 8, 9, 10])


def test_decode_hand_built_up_and_paeth_filters():
    # row 1 plain, row 2 Up (adds row 1), row 3 Paeth
    r1 = bytes([0]) + bytes([10, 20])
    r2 = bytes([2]) + bytes([1, 2])  # -> 11, 22
    r3 = bytes([4]) + bytes([3, 4])  # paeth(left, up, upleft)
    data = _hand_built_png(w=2, h=3, color=0, rows=[r1, r2, r3])
    _, _, _, px = png_decode(data)
    # row 3: first byte a=0,b=11,c=0 -> p=11 -> predictor 11; 3+11=14
    #        second byte a=14,b=22,c=11 -> p=25: |25-14|=11,|25-22|=3,
    #        |25-11|=14 -> predictor b=22; 4+22=26
    assert px == bytes([10, 20, 11, 22, 14, 26])


def test_decoder_skips_ancillary_chunks():
    data = _hand_built_png(extra_chunks=((b"tEXt", b"k\x00v"),))
    w, h, c, px = png_decode(data)
    assert (w, h, c) == (2, 2, 3) and len(px) == 12


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[:16] + bytes([d[16] ^ 0xFF]) + d[17:], "CRC"),
        (lambda d: d[:-12], "missing IEND"),
    ],
)
def test_decoder_rejects_corruption(mutate, msg):
    data = _hand_built_png()
    with pytest.raises(PngFormatError, match=msg):
        png_decode(mutate(data))


@pytest.mark.parametrize(
    "kwargs, msg",
    [
        (dict(depth=16), "bit depth"),
        (dict(depth=4), "bit depth"),
        (dict(color=3), "color type"),
        (dict(interlace=1), "interlaced"),
    ],
)
def test_decoder_names_unsupported_variants(kwargs, msg):
    """Valid-but-out-of-scope PNGs raise with the reason named, so a
    pipeline can group its quarantine bucket by failure class."""
    data = _hand_built_png(**kwargs)
    with pytest.raises(PngFormatError, match=msg):
        png_decode(data)


def test_decoder_rejects_size_mismatch():
    # IHDR says 4x4 but IDAT carries a 2x2 image's bytes
    small_rows = [bytes([0]) + bytes(6) for _ in range(2)]
    data = _hand_built_png(w=4, h=4, color=2, rows=small_rows)
    with pytest.raises(PngFormatError, match="decompressed size"):
        png_decode(data)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    data=st.data(),
)
def test_roundtrip_property(w, h, ch, ftype, data):
    """encode(decode) identity over random pixel buffers, every
    channel count x every filter type — the VERDICT r08 #2 golden
    criterion."""
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    enc = png_encode(w, h, px, ch, filter_type=ftype)
    got = png_decode(enc)
    assert got == (w, h, ch, px)


def test_encoder_rejects_bad_args():
    with pytest.raises(PngFormatError, match="channels"):
        png_encode(2, 2, bytes(20), channels=5)
    with pytest.raises(PngFormatError, match="pixel buffer"):
        png_encode(2, 2, bytes(5), channels=3)
    with pytest.raises(PngFormatError, match="filter type"):
        png_encode(1, 1, bytes(3), channels=3, filter_type=9)


def test_phash_real_separates_planted_negatives(spark):
    """The aHash near-dup verdict must accept every brightened twin
    and reject every planted different-image twin (seed % 5 == 0) —
    perfect separation on the synthesized corpus."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["multimodal_phash_real"].build(
        spark, SF_SMOKE
    ).collect()
    assert rows
    for r in rows:
        if r.seed % 5 == 0:
            assert not r.is_neardup and r.hamming > 8, r
        else:
            assert r.is_neardup and r.hamming <= 8, r


def test_unfilter_matches_scalar_spec_reference():
    """The numpy unfilter must be BIT-identical to the scalar spec
    (`_predictor`, kept as the reference implementation): decode the
    same filtered stream both ways over every filter type and odd
    geometries."""
    import random

    from parquet_to_sql_spark.operators.png import (
        _predictor,
        _unfilter,
        png_encode,
    )
    import struct as _struct
    import zlib as _zlib

    def scalar_unfilter(raw, w, h, nch):
        stride = w * nch
        out = bytearray(stride * h)
        prev = b""
        for row in range(h):
            base = row * (stride + 1)
            ftype = raw[base]
            line = bytearray(raw[base + 1 : base + 1 + stride])
            if ftype:
                for i in range(stride):
                    line[i] = (
                        line[i] + _predictor(ftype, line, prev, i, nch)
                    ) & 0xFF
            out[row * stride : (row + 1) * stride] = line
            prev = bytes(line)
        return bytes(out)

    rng = random.Random(7)
    for nch in (1, 2, 3, 4):
        for w, h in ((1, 1), (3, 5), (17, 4), (32, 9)):
            px = bytes(rng.randrange(256) for _ in range(w * h * nch))
            for ftype in range(5):
                payload = png_encode(w, h, px, channels=nch, filter_type=ftype)
                # pull the raw filtered stream back out of the IDAT
                i = payload.index(b"IDAT") - 4
                (ln,) = _struct.unpack(">I", payload[i : i + 4])
                raw = _zlib.decompress(payload[i + 8 : i + 8 + ln])
                assert _unfilter(raw, w, h, nch) == scalar_unfilter(
                    raw, w, h, nch
                ), (nch, w, h, ftype)

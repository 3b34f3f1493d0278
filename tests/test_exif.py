"""EXIF reader/strip (operators/exif.py): round-trips in both byte
orders, inline vs out-of-line values, GPS detection, strip leaving
image bytes decode-identical, and typed quarantine for malformed
TIFF structures."""

from __future__ import annotations

import struct

import pytest

from parquet_to_sql_spark.operators.exif import (
    ExifFormatError,
    exif_build_app1,
    exif_inject,
    exif_parse,
    exif_strip,
)
from parquet_to_sql_spark.operators.jpeg import jpeg_decode, jpeg_encode


def _base():
    return jpeg_encode(8, 8, bytes([77] * 64), 1, quant=8)


@pytest.mark.parametrize("le", [True, False])
@pytest.mark.parametrize("gps", [True, False])
def test_roundtrip_orders_and_gps(le, gps):
    t = exif_inject(
        _base(),
        exif_build_app1(orientation=5, make="acme cam", with_gps=gps,
                        little_endian=le),
    )
    info = exif_parse(t)
    assert info["has_exif"] and info["orientation"] == 5
    assert info["make"] == "acme cam"
    assert info["has_gps"] is gps
    assert info["byte_order"] == ("II" if le else "MM")


def test_inline_short_make():
    t = exif_inject(_base(), exif_build_app1(orientation=1, make="abc"))
    assert exif_parse(t)["make"] == "abc"


def test_strip_removes_all_app1_and_preserves_image():
    base = _base()
    t = exif_inject(
        exif_inject(base, exif_build_app1(orientation=3, with_gps=True)),
        exif_build_app1(orientation=4),
    )
    assert exif_parse(t)["n_app1_segments"] == 2
    s = exif_strip(t)
    info = exif_parse(s)
    assert info["n_app1_segments"] == 0 and not info["has_gps"]
    assert jpeg_decode(s) == jpeg_decode(base)
    assert exif_strip(base) == base  # no-op without APP1


def test_fill_bytes_and_standalone_markers_are_skipped():
    """ADVICE r10: T.81 allows 0xFF fill bytes before any marker and
    standalone markers (TEM 0x01) with NO length field — the segment
    walker must pass over both instead of reading pixel-adjacent
    bytes as a segment length.  Construct a JPEG with a fill byte and
    a TEM between SOI and the APP1, and verify parse + strip both
    still see the EXIF and produce a decode-identical image."""
    base = _base()
    app1 = exif_build_app1(orientation=6, with_gps=True)
    # SOI + fill byte + TEM + APP1 + rest-of-jpeg
    weird = base[:2] + b"\xff" + b"\xff\x01" + app1 + base[2:]
    info = exif_parse(weird)
    assert info["has_exif"] and info["has_gps"]
    assert info["orientation"] == 6
    stripped = exif_strip(weird)
    assert exif_parse(stripped)["n_app1_segments"] == 0
    assert jpeg_decode(stripped) == jpeg_decode(base)


def test_plain_jpeg_has_no_exif():
    info = exif_parse(_base())
    assert not info["has_exif"] and info["orientation"] is None


def test_quarantine_errors_are_typed():
    base = _base()
    good = exif_build_app1(orientation=2, make="abcdef", with_gps=True)
    bad_order = good.replace(b"II", b"XX", 1)
    with pytest.raises(ExifFormatError, match="byte order"):
        exif_parse(exif_inject(base, bad_order))
    i = good.index(b"II") + 2
    bad_magic = good[:i] + struct.pack("<H", 43) + good[i + 2 :]
    with pytest.raises(ExifFormatError, match="magic"):
        exif_parse(exif_inject(base, bad_magic))
    with pytest.raises(ExifFormatError, match="not a JPEG"):
        exif_parse(b"nope")


def test_apply_orientation_all_eight_and_quarantine():
    """Exif 2.3 orientation transforms on an asymmetric 2x3 image:
    every output checked cell-exact against the hand-derived
    expectation; dims swap for 5-8; out-of-range values quarantine."""
    import numpy as np
    import pytest

    from parquet_to_sql_spark.operators.exif import (
        ExifFormatError,
        exif_apply_orientation,
    )

    img = np.arange(6, dtype=np.uint8).reshape(2, 3)  # [[0 1 2],[3 4 5]]
    px = img.tobytes()
    expect = {
        1: [[0, 1, 2], [3, 4, 5]],
        2: [[2, 1, 0], [5, 4, 3]],
        3: [[5, 4, 3], [2, 1, 0]],
        4: [[3, 4, 5], [0, 1, 2]],
        5: [[0, 3], [1, 4], [2, 5]],
        6: [[3, 0], [4, 1], [5, 2]],          # 90 CW
        7: [[5, 2], [4, 1], [3, 0]],
        8: [[2, 5], [1, 4], [0, 3]],          # 90 CCW
    }
    for o, exp in expect.items():
        out, ow, oh = exif_apply_orientation(px, 3, 2, 1, o)
        got = np.frombuffer(out, np.uint8).reshape(oh, ow)
        assert got.tolist() == exp, o
        assert (ow, oh) == ((2, 3) if o >= 5 else (3, 2))
    # 3-channel: channels ride along untouched
    rgb = np.stack([img, img + 10, img + 20], axis=-1).astype(np.uint8)
    out, ow, oh = exif_apply_orientation(rgb.tobytes(), 3, 2, 3, 6)
    got = np.frombuffer(out, np.uint8).reshape(oh, ow, 3)
    assert got[:, :, 0].tolist() == expect[6]
    assert (got[:, :, 1] - got[:, :, 0] == 10).all()
    for bad in (0, 9, -1):
        with pytest.raises(ExifFormatError, match="outside 1..8"):
            exif_apply_orientation(px, 3, 2, 1, bad)

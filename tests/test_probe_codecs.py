"""BMP codec + TIFF dimensions probe + MP3 frame-header probe:
round-trips, edge variants, typed quarantines.  Driver-checkable
twins: multimodal_bmp_decode_real / multimodal_container_probe_real."""

import numpy as np
import pytest

from parquet_to_sql_spark.operators.bmp import (
    BmpFormatError,
    bmp_decode,
    bmp_dimensions,
    bmp_encode,
)
from parquet_to_sql_spark.operators.exif import (
    ExifFormatError,
    tiff_build_header,
    tiff_dimensions,
)
from parquet_to_sql_spark.operators.mp3 import (
    Mp3FormatError,
    mp3_build,
    mp3_probe,
)


@pytest.mark.parametrize(
    "w,h,ch,td",
    [(7, 5, 3, False), (8, 4, 3, True), (5, 9, 4, False), (6, 3, 4, True),
     (1, 1, 3, False), (13, 1, 4, True)],
)
def test_bmp_roundtrip_24_32(w, h, ch, td):
    """24/32-bit BGR(A) round-trips bit-exactly, bottom-up and
    top-down storage, including rows needing 4-byte padding."""
    rng = np.random.RandomState(w * h * ch)
    px = rng.randint(0, 256, w * h * ch).astype(np.uint8).tobytes()
    pay = bmp_encode(w, h, px, channels=ch, top_down=td)
    assert bmp_decode(pay) == (w, h, ch, px)
    assert bmp_dimensions(pay) == (w, h, ch)


def test_bmp_paletted_roundtrip():
    rng = np.random.RandomState(3)
    pal = [bytes(rng.randint(0, 256, 3).astype(np.uint8)) for _ in range(17)]
    idx = rng.randint(0, 17, 11 * 6).astype(np.uint8).tobytes()
    pay = bmp_encode(11, 6, idx, palette=pal)
    w, h, c, out = bmp_decode(pay)
    assert (w, h, c) == (11, 6, 3)
    assert out == b"".join(pal[k] for k in idx)


def test_bmp_quarantines_are_typed():
    pay = bmp_encode(4, 4, bytes(48), channels=3)
    with pytest.raises(BmpFormatError, match="signature"):
        bmp_decode(b"XX" + pay[2:])
    rle = bytearray(pay)
    rle[30] = 1  # BI_RLE8
    with pytest.raises(BmpFormatError, match="compression"):
        bmp_decode(bytes(rle))
    b16 = bytearray(pay)
    b16[28] = 16
    with pytest.raises(BmpFormatError, match="16-bit"):
        bmp_decode(bytes(b16))
    with pytest.raises(BmpFormatError, match="truncated"):
        bmp_decode(pay[:-8])
    core = bytearray(pay)
    core[14] = 12  # BITMAPCOREHEADER
    with pytest.raises(BmpFormatError, match="CORE"):
        bmp_dimensions(bytes(core))


@pytest.mark.parametrize("be", [False, True])
def test_tiff_probe_both_byte_orders(be):
    assert tiff_dimensions(tiff_build_header(640, 480, 3, be)) == (640, 480, 3)
    assert tiff_dimensions(tiff_build_header(7, 9, 1, be)) == (7, 9, 1)


def test_tiff_probe_quarantines():
    good = tiff_build_header(8, 8)
    with pytest.raises(ExifFormatError, match="byte order"):
        tiff_dimensions(b"XX" + good[2:])
    bad_magic = bytearray(good)
    bad_magic[2] = 43
    with pytest.raises(ExifFormatError, match="magic"):
        tiff_dimensions(bytes(bad_magic))
    # drop the ImageLength entry: count 3 -> walk misses tag 257
    import struct

    trunc = bytearray(good)
    struct.pack_into("<H", trunc, 8, 2)  # keep only first 2 entries
    # entries are width, height, spp -> keeping 2 still has both dims
    struct.pack_into("<H", trunc, 8, 1)  # only width
    with pytest.raises(ExifFormatError, match="ImageWidth/ImageLength"):
        tiff_dimensions(bytes(trunc))


def test_mp3_probe_versions_padding_id3():
    """MPEG1/2/2.5 tables, padding arithmetic, ID3v2 skip, ID3v1
    trailer, exact integer duration."""
    d = mp3_build(10, version=3, bitrate_index=9, rate_index=0)
    assert mp3_probe(d) == {
        "n_frames": 10, "sample_rate": 44100, "channels": 2,
        "bitrate_kbps": 128, "vbr": False,
        "duration_ms": 10 * 1152 * 1000 // 44100, "version": "1",
    }
    d2 = mp3_build(
        7, version=2, bitrate_index=5, rate_index=1, mono=True,
        pad_pattern=lambda i: i % 2, id3v2_bytes=33,
    )
    p2 = mp3_probe(d2)
    assert (p2["n_frames"], p2["sample_rate"], p2["channels"]) == (7, 24000, 1)
    assert p2["version"] == "2"
    assert p2["duration_ms"] == 7 * 576 * 1000 // 24000
    d25 = mp3_build(3, version=0, bitrate_index=2, rate_index=2)
    p25 = mp3_probe(d25)
    assert (p25["sample_rate"], p25["version"]) == (8000, "2.5")
    assert mp3_probe(d + b"TAG" + b"\x00" * 125)["n_frames"] == 10


def test_mp3_probe_quarantines():
    d = mp3_build(4)
    with pytest.raises(Mp3FormatError, match="sync"):
        mp3_probe(b"\x00" * 64)
    with pytest.raises(Mp3FormatError, match="truncated"):
        mp3_probe(d[:-10])
    # Layer II header
    h = bytearray(d)
    h[1] = (h[1] & ~0x06) | 0x04
    with pytest.raises(Mp3FormatError, match="Layer"):
        mp3_probe(bytes(h))
    # free-format bitrate
    f = bytearray(d)
    f[2] &= 0x0F
    with pytest.raises(Mp3FormatError, match="free-format"):
        mp3_probe(bytes(f))
    with pytest.raises(Mp3FormatError, match="frames found"):
        mp3_probe(b"ID3\x04\x00\x00\x00\x00\x00\x00")


def test_mp4_probe_box_walk():
    """ISO-BMFF box walk: both mvhd versions, largesize framing,
    video-dims binding through trak/mdia, multi-track flags."""
    from parquet_to_sql_spark.operators.mp4 import (
        Mp4FormatError,
        mp4_build,
        mp4_probe,
    )

    d = mp4_build(
        1000, 5500,
        [{"kind": "vide", "width": 640, "height": 360},
         {"kind": "soun"}],
    )
    assert mp4_probe(d) == {
        "brand": "isom", "timescale": 1000, "duration_ms": 5500,
        "n_tracks": 2, "width": 640, "height": 360,
        "has_video": True, "has_audio": True,
    }
    d2 = mp4_build(
        90000, 123456789, [{"kind": "soun"}], brand="mp42",
        mvhd_v1=True, largesize_moov=True,
    )
    p2 = mp4_probe(d2)
    assert p2["duration_ms"] == 123456789 * 1000 // 90000
    assert p2["brand"] == "mp42" and p2["width"] is None
    assert p2["has_audio"] and not p2["has_video"]
    with pytest.raises(Mp4FormatError, match="truncated"):
        mp4_probe(d[:20])
    with pytest.raises(Mp4FormatError, match="out of range"):
        mp4_probe(d[:-5])
    with pytest.raises(Mp4FormatError, match="timescale"):
        mp4_probe(mp4_build(0, 5, [{"kind": "vide", "width": 1,
                                    "height": 1}]))
    with pytest.raises(Mp4FormatError, match="no moov"):
        mp4_probe(d[: d.index(b"moov") - 4])


def test_svg_dimensions_probe():
    """Root-tag width/height (bare + px), viewBox fallback for
    missing/relative sides, prolog skipping, typed quarantines."""
    from parquet_to_sql_spark.operators.svg import (
        SvgFormatError,
        svg_dimensions,
    )

    assert svg_dimensions(b'<svg width="640" height="480"/>') == (640, 480)
    assert svg_dimensions(
        b'<?xml version="1.0"?>\n<!-- c --><!DOCTYPE svg>\n'
        b"<svg  height='9px' width=\"7px\" ></svg>"
    ) == (7, 9)
    assert svg_dimensions(b'<svg viewBox="0 0 120.0 80"></svg>') == (120, 80)
    assert svg_dimensions(
        b'<svg width="100%" height="50" viewBox="0,0,300,200"/>'
    ) == (300, 50)
    with pytest.raises(SvgFormatError, match="root"):
        svg_dimensions(b"<div>no svg</div>")
    with pytest.raises(SvgFormatError, match="intrinsic"):
        svg_dimensions(b'<svg width="100%"></svg>')
    with pytest.raises(SvgFormatError, match="non-positive"):
        svg_dimensions(b'<svg width="0" height="5"/>')
    with pytest.raises(SvgFormatError, match="bad viewBox"):
        svg_dimensions(b'<svg viewBox="0 0 x y"/>')

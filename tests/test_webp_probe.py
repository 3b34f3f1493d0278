"""WebP header-probe suite: all three bitstream layouts, alpha
flags, padding, typed quarantines."""

import struct

import pytest

from parquet_to_sql_spark.operators.webp import (
    WebpFormatError,
    webp_container,
    webp_dimensions,
)


@pytest.mark.parametrize("kind", ["VP8 ", "VP8L", "VP8X"])
@pytest.mark.parametrize("w,h", [(1, 1), (7, 9), (640, 480), (16383, 1)])
def test_probe_reads_dimensions(kind, w, h):
    assert webp_dimensions(webp_container(w, h, kind)) == (w, h, 3)


def test_alpha_flags():
    assert webp_dimensions(webp_container(3, 5, "VP8L", alpha=True)) == (3, 5, 4)
    assert webp_dimensions(webp_container(3, 5, "VP8X", alpha=True)) == (3, 5, 4)
    assert webp_dimensions(webp_container(3, 5, "VP8L")) == (3, 5, 3)


def test_vp8_scaling_bits_masked():
    """The upper 2 bits of the lossy dims are scaling hints — the
    probe must mask them off (14-bit dimensions)."""
    pay = bytearray(webp_container(100, 50, "VP8 "))
    i = pay.index(b"\x9d\x01\x2a") + 3
    w_raw = struct.unpack("<H", pay[i : i + 2])[0] | 0x8000
    pay[i : i + 2] = struct.pack("<H", w_raw)
    assert webp_dimensions(bytes(pay)) == (100, 50, 3)


def test_quarantines_are_typed():
    good = webp_container(8, 8, "VP8 ")
    with pytest.raises(WebpFormatError, match="RIFF"):
        webp_dimensions(b"RIFX" + good[4:])
    with pytest.raises(WebpFormatError, match="RIFF"):
        webp_dimensions(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(WebpFormatError, match="truncated"):
        webp_dimensions(good[:-3])
    with pytest.raises(WebpFormatError, match="start code"):
        webp_dimensions(good.replace(b"\x9d\x01\x2a", b"\x9d\x01\x2b"))
    bad_sig = bytearray(webp_container(8, 8, "VP8L"))
    bad_sig[20] = 0x30  # VP8L signature byte
    with pytest.raises(WebpFormatError, match="signature"):
        webp_dimensions(bytes(bad_sig))
    # a version != 0 VP8L stream quarantines
    verbad = bytearray(webp_container(8, 8, "VP8L"))
    verbad[24] |= 0x20  # version bits live at 29-31 of the LE word
    with pytest.raises(WebpFormatError, match="version"):
        webp_dimensions(bytes(verbad))
    # an ALPH/ICCP-first container is not a bitstream-first layout
    alph = good[:12] + b"ALPH" + good[16:]
    with pytest.raises(WebpFormatError, match="not a WebP bitstream"):
        webp_dimensions(alph)
    # dims live at body+6 = byte 26 of the container
    with pytest.raises(WebpFormatError, match="zero-dimension"):
        webp_dimensions(
            good[:26] + struct.pack("<HH", 0, 8) + good[30:]
        )

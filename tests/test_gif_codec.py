"""GIF codec unit suite: LZW edge cases, interlace, palettes,
animation-first-frame, transparency, typed quarantines.

The driver-checkable twin is ``multimodal_gif_decode_real`` (oracle
regenerates the palette-mapped pixel relation arithmetically); this
suite pins the codec internals the gate can't reach — 12-bit table
growth with mid-stream clears, deferred clear, the KwKwK case,
sub-block framing, frame offsets, local-palette override."""

import struct

import numpy as np
import pytest

from parquet_to_sql_spark.operators.gif import (
    GifFormatError,
    _lzw_decode,
    gif_decode,
    gif_dimensions,
    gif_encode,
)


def _pal(n: int, seed: int = 0) -> list[bytes]:
    rng = np.random.RandomState(seed)
    return [bytes(rng.randint(0, 256, 3).astype(np.uint8)) for _ in range(n)]


@pytest.mark.parametrize(
    "w,h,npal,interlace,seed",
    [
        (8, 8, 2, False, 1),
        (13, 7, 5, False, 2),
        (16, 16, 16, True, 3),
        (31, 9, 256, True, 4),
        (64, 48, 256, False, 5),
    ],
)
def test_roundtrip_exact(w, h, npal, interlace, seed):
    """encode -> decode reproduces the palette-mapped pixels exactly
    (all palette sizes, interlaced and sequential row order)."""
    rng = np.random.RandomState(seed)
    palette = _pal(npal, seed)
    idx = rng.randint(0, npal, w * h).astype(np.uint8).tobytes()
    payload = gif_encode(w, h, idx, palette, interlace=interlace)
    rw, rh, rc, out = gif_decode(payload)
    assert (rw, rh, rc) == (w, h, 3)
    exp = np.frombuffer(b"".join(palette), np.uint8).reshape(npal, 3)[
        np.frombuffer(idx, np.uint8)
    ]
    assert out == exp.tobytes()
    assert gif_dimensions(payload) == (w, h, 3)


def test_lzw_table_growth_to_12_bits_and_midstream_clear():
    """A 256-color 128x128 random frame defines >4096 LZW entries, so
    the encoder grows the code width 9->12, resets with a clear code
    at table-full, and the decoder tracks both — exact round-trip is
    the proof."""
    rng = np.random.RandomState(11)
    w = h = 128
    idx = rng.randint(0, 256, w * h).astype(np.uint8).tobytes()
    payload = gif_encode(w, h, idx, _pal(256, 11))
    assert gif_decode(payload)[3] == (
        np.frombuffer(b"".join(_pal(256, 11)), np.uint8)
        .reshape(256, 3)[np.frombuffer(idx, np.uint8)]
        .tobytes()
    )


def test_lzw_kwkwk_and_deferred_clear_and_range_errors():
    """Hand-packed code streams: the KwKwK case (code == next free
    entry) decodes as prev+prev[0]; a stream that keeps emitting
    without a clear after the table conceptually fills is accepted
    (deferred clear — table just stops growing); codes beyond the
    table raise typed errors."""
    # mcs=2: clear=4, eoi=5, width 3.  codes [clear, 0, 6] -> 0,0,0
    acc = 4 | (0 << 3) | (6 << 6)
    stream = bytes((acc & 0xFF, acc >> 8))
    assert _lzw_decode(stream, 2, 3) == b"\x00\x00\x00"
    # code 7 after only entry 6 exists -> out of range
    acc = 4 | (0 << 3) | (7 << 6)
    with pytest.raises(GifFormatError, match="out of range"):
        _lzw_decode(bytes((acc & 0xFF, acc >> 8)), 2, 4)
    # first code after clear must be a root
    acc = 4 | (6 << 3)
    with pytest.raises(GifFormatError, match="not a root"):
        _lzw_decode(bytes((acc & 0xFF, acc >> 8)), 2, 2)
    # truncated: n_px asks for more than the stream provides
    with pytest.raises(GifFormatError, match="truncated LZW"):
        _lzw_decode(b"\x04", 2, 9)


def test_animation_decodes_first_frame_only():
    """Two image descriptors: the decoder returns frame 1 and ignores
    the rest (a features stage wants one representative frame)."""
    pal = [b"\x10\x20\x30", b"\xa0\xb0\xc0"]
    f1 = gif_encode(4, 4, bytes([0, 1] * 8), pal)
    f2 = gif_encode(4, 4, bytes([1, 0] * 8), pal)
    # splice frame 2's descriptor+data before frame 1's trailer
    animated = f1[:-1] + f2[13 + 4 * 3 : ]
    assert gif_decode(animated) == gif_decode(f1)


def test_transparency_renders_background():
    """GIF89a Graphic Control transparency: transparent pixels of the
    first frame show the logical-screen background color."""
    pal = [b"\x07\x08\x09", b"\xff\x00\x00", b"\x00\xff\x00"]
    idx = bytes([0, 1, 2, 1])
    payload = gif_encode(2, 2, idx, pal, transparent=1, background=2)
    _, _, _, out = gif_decode(payload)
    exp = b"\x07\x08\x09" + b"\x00\xff\x00" + b"\x00\xff\x00" * 2
    assert out == exp


def test_frame_offset_composites_on_background():
    """A frame rectangle smaller than the logical screen: uncovered
    canvas renders the background color, the frame lands at
    (left, top).  Built by patching the encoder's descriptor."""
    pal = [b"\x01\x02\x03", b"\xfe\xfd\xfc"]
    full = gif_encode(2, 1, bytes([1, 1]), pal, background=0)
    # widen the logical screen to 4x3 and move the frame to (1, 1)
    patched = bytearray(full)
    patched[6:10] = struct.pack("<HH", 4, 3)
    di = full.index(b"\x2c")
    patched[di + 1 : di + 9] = struct.pack("<HHHH", 1, 1, 2, 1)
    w, h, c, out = gif_decode(bytes(patched))
    assert (w, h, c) == (4, 3, 3)
    a = np.frombuffer(out, np.uint8).reshape(3, 4, 3)
    assert np.array_equal(a[1, 1], [0xFE, 0xFD, 0xFC])
    assert np.array_equal(a[1, 2], [0xFE, 0xFD, 0xFC])
    assert (a[0] == [1, 2, 3]).all() and (a[2] == [1, 2, 3]).all()
    assert np.array_equal(a[1, 0], [1, 2, 3])


def test_local_palette_overrides_global_and_gif87a():
    """A local color table wins over the global one; the GIF87a
    signature is accepted."""
    pal_g = [b"\x11\x11\x11", b"\x22\x22\x22"]
    pal_l = [b"\x33\x33\x33", b"\x44\x44\x44"]
    payload = gif_encode(2, 1, bytes([0, 1]), pal_g)
    di = payload.index(b"\x2c")
    lct = b"".join(pal_l) + b"\x00\x00\x00" * 2
    # descriptor packed byte (di+9) gains the LCT flag, size bits 1
    # -> a 4-entry local table spliced in right after it
    body = bytearray(payload)
    body[di + 9] = 0x81
    patched = bytes(body[: di + 10]) + lct + bytes(body[di + 10 :])
    w, h, c, out = gif_decode(patched)
    assert out == b"\x33\x33\x33\x44\x44\x44"
    old = gif_decode(payload)[3]
    assert old == b"\x11\x11\x11\x22\x22\x22"
    g87 = b"GIF87a" + payload[6:]
    assert gif_decode(g87)[3] == old


def test_comment_and_application_extensions_skipped():
    """0x21-introduced comment/application blocks before the image
    descriptor are passed over via sub-block framing."""
    pal = [b"\x0a\x0b\x0c", b"\x0d\x0e\x0f"]
    payload = gif_encode(2, 1, bytes([0, 1]), pal)
    di = payload.index(b"\x2c")
    comment = b"\x21\xfe\x05hello\x00"
    app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    spliced = payload[:di] + comment + app + payload[di:]
    assert gif_decode(spliced)[3] == gif_decode(payload)[3]


def test_quarantine_errors_are_typed():
    """Malformed/unsupported inputs raise GifFormatError naming the
    reason — routed, never guessed."""
    pal = [b"\x00\x00\x00", b"\xff\xff\xff"]
    good = gif_encode(2, 2, bytes([0, 1, 1, 0]), pal)
    with pytest.raises(GifFormatError, match="signature"):
        gif_decode(b"NOTGIF" + good[6:])
    with pytest.raises(GifFormatError, match="signature"):
        gif_dimensions(b"\x89PNG\r\n\x1a\n" + good[8:])
    with pytest.raises(GifFormatError, match="truncated"):
        gif_decode(good[:-4])
    # strip the GCT flag: no color table anywhere (2-color palette
    # pads to a 4-entry table = 12 bytes after the 13-byte header)
    nogct = bytearray(good)
    nogct[10] &= 0x7F
    with pytest.raises(GifFormatError, match="color table"):
        gif_decode(bytes(nogct[:13]) + bytes(nogct[13 + 12 :]))
    # frame rectangle exceeding the logical screen
    bad = bytearray(good)
    di = good.index(b"\x2c")
    bad[di + 1 : di + 9] = struct.pack("<HHHH", 1, 0, 2, 2)
    with pytest.raises(GifFormatError, match="exceeds"):
        gif_decode(bytes(bad))
    # unknown block introducer
    spliced = good[: 13 + 12] + b"\x99" + good[13 + 12 :]
    with pytest.raises(GifFormatError, match="introducer"):
        gif_decode(spliced)
    with pytest.raises(GifFormatError, match="no image descriptor"):
        gif_decode(good[: 13 + 12] + b"\x3b")
    # encoder scope errors
    with pytest.raises(GifFormatError, match="indices"):
        gif_encode(2, 2, b"\x00", pal)
    with pytest.raises(GifFormatError, match="palette"):
        gif_encode(1, 1, b"\x00", [b"\x00\x00\x00"] * 257)
    with pytest.raises(GifFormatError, match="outside palette"):
        gif_encode(2, 1, bytes([0, 5]), pal)


def test_animation_frames_walk_with_delays_and_palettes():
    """gif_frames returns every frame composited on the logical
    screen with its own delay/disposal metadata; local palettes
    apply per frame; max_frames caps the walk."""
    from parquet_to_sql_spark.operators.gif import (
        gif_encode_animation,
        gif_frames,
    )

    palA = [b"\x01\x01\x01", b"\x02\x02\x02"]
    palB = [b"\x09\x09\x09", b"\x0c\x0c\x0c"]
    frames = [
        {"indices": bytes([0, 1, 1, 0]), "palette": palA, "delay_cs": 10},
        {"indices": bytes([1, 1, 0, 0]), "palette": palB, "delay_cs": 25,
         "interlace": True},
    ]
    payload = gif_encode_animation(2, 2, frames)
    sw, sh, out = gif_frames(payload)
    assert (sw, sh) == (2, 2) and len(out) == 2
    assert out[0]["rgb"] == b"\x01\x01\x01\x02\x02\x02\x02\x02\x02\x01\x01\x01"
    assert out[1]["rgb"] == b"\x0c\x0c\x0c\x0c\x0c\x0c\x09\x09\x09\x09\x09\x09"
    assert [f["delay_cs"] for f in out] == [10, 25]
    assert [f["interlaced"] for f in out] == [False, True]
    assert [f["local_palette"] for f in out] == [True, True]
    _, _, capped = gif_frames(payload, max_frames=1)
    assert len(capped) == 1 and capped[0]["rgb"] == out[0]["rgb"]


def test_animation_transparency_composites_over_previous():
    """A transparent pixel in frame 2 shows frame 1's pixel (not the
    background) — the compositing rule that makes partial-update
    animations work."""
    from parquet_to_sql_spark.operators.gif import (
        gif_encode_animation,
        gif_frames,
    )

    pal = [b"\x11\x11\x11", b"\x22\x22\x22", b"\x33\x33\x33"]
    frames = [
        {"indices": bytes([0, 1, 1, 0])},
        {"indices": bytes([2, 2, 2, 2]), "transparent": 2},  # all clear
        {"indices": bytes([2, 0, 2, 0]), "transparent": 2},
    ]
    payload = gif_encode_animation(2, 2, frames, global_palette=pal)
    _, _, out = gif_frames(payload)
    f1 = b"\x11\x11\x11\x22\x22\x22\x22\x22\x22\x11\x11\x11"
    assert out[0]["rgb"] == f1
    assert out[1]["rgb"] == f1  # fully transparent frame: unchanged
    assert out[2]["rgb"] == (
        b"\x11\x11\x11" + b"\x11\x11\x11" + b"\x22\x22\x22" + b"\x11\x11\x11"
    )


def test_animation_disposal_background_and_previous():
    """Disposal 2 restores the frame's RECT to the background color
    before the next frame; disposal 3 restores the pre-frame canvas."""
    import struct as _s

    from parquet_to_sql_spark.operators.gif import (
        gif_encode_animation,
        gif_frames,
    )

    pal = [b"\xaa\xaa\xaa", b"\xbb\xbb\xbb", b"\xcc\xcc\xcc"]
    bg = b"\xaa\xaa\xaa"  # background index 0
    # frame 1 paints the whole 2x2 canvas 1; frame 2 paints the
    # top-left single pixel 2 with disposal 2 (restore rect to bg);
    # frame 3 is fully transparent so it shows the disposed canvas
    frames = [
        {"indices": bytes([1, 1, 1, 1])},
        {"indices": bytes([2]), "fw": 1, "fh": 1, "disposal": 2},
        {"indices": bytes([2, 2, 2, 2]), "transparent": 2},
    ]
    payload = gif_encode_animation(2, 2, frames, global_palette=pal,
                                   background=0)
    _, _, out = gif_frames(payload)
    full1 = b"\xbb\xbb\xbb" * 4
    assert out[0]["rgb"] == full1
    assert out[1]["rgb"] == b"\xcc\xcc\xcc" + b"\xbb\xbb\xbb" * 3
    assert out[2]["rgb"] == bg + b"\xbb\xbb\xbb" * 3  # rect restored to bg

    # disposal 3: restore to previous
    frames3 = [
        {"indices": bytes([1, 1, 1, 1])},
        {"indices": bytes([2, 2, 2, 2]), "disposal": 3},
        {"indices": bytes([0]), "fw": 1, "fh": 1, "transparent": 0},
    ]
    payload3 = gif_encode_animation(2, 2, frames3, global_palette=pal)
    _, _, out3 = gif_frames(payload3)
    assert out3[1]["rgb"] == b"\xcc\xcc\xcc" * 4
    assert out3[2]["rgb"] == full1  # frame 2's paint fully undone


def test_animation_netscape_loop_roundtrip():
    """The NETSCAPE2.0 loop extension is written and skipped cleanly;
    gif_decode still returns only the first frame."""
    from parquet_to_sql_spark.operators.gif import (
        gif_decode,
        gif_encode_animation,
        gif_frames,
    )

    pal = [b"\x01\x02\x03", b"\x04\x05\x06"]
    frames = [
        {"indices": bytes([0, 1])},
        {"indices": bytes([1, 0])},
    ]
    payload = gif_encode_animation(2, 1, frames, global_palette=pal, loop=3)
    assert b"NETSCAPE2.0" in payload
    _, _, out = gif_frames(payload)
    assert len(out) == 2
    assert gif_decode(payload)[3] == out[0]["rgb"]

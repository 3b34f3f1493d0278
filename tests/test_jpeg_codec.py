"""Baseline JPEG codec (operators/jpeg.py): golden structure, a
hand-derived fixed-byte fixture (decoder checked independently of the
encoder), flat-block exactness (the gate query's oracle contract),
error bounds on arbitrary content, restart markers, 4:2:0 subsampled
decode, and typed quarantine for every out-of-scope variant."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_sql_spark.operators.jpeg import (
    JpegFormatError,
    _BitWriter,
    _HuffTable,
    _K_AC_LUMA,
    _K_DC_CHROMA,
    _K_DC_LUMA,
    jpeg_decode,
    jpeg_dimensions,
    jpeg_encode,
)


def _flat_blocks(w: int, h: int, seed: int) -> bytes:
    """Per-8x8-block-constant grayscale pattern (blocks in row-major
    order get value (seed + 11*i) % 256)."""
    bw, bh = w // 8, h // 8
    img = np.zeros((h, w), dtype=np.uint8)
    for i in range(bw * bh):
        by, bx = divmod(i, bw)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (seed + 11 * i) % 256
    return img.tobytes()


def test_golden_structure():
    p = jpeg_encode(16, 8, _flat_blocks(16, 8, 3), channels=1)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in p and b"\xff\xc0" in p and b"\xff\xc4" in p
    i = p.index(b"\xff\xc0") + 4
    prec, hh, ww, nc = p[i], *struct.unpack(">HH", p[i + 1 : i + 5]), p[i + 5]
    assert (prec, hh, ww, nc) == (8, 8, 16, 1)


def test_hand_derived_fixture_decodes_exactly():
    """A single 8x8 grayscale flat-130 JPEG built BY HAND from the
    T.81 spec (Annex K tables, canonical codes derived on paper):
    DC = 8*(130-128) = 16 with quant 1 -> category 5, code '110',
    magnitude '10000'; EOB = '1010'; 1-padded to 0xD0 0xAF.  The
    decoder must reproduce 64x value 130 — this checks canonical
    Huffman construction, EXTEND, dequant and IDCT independently of
    the encoder."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    dc_bits, dc_vals = _K_DC_LUMA
    ac_bits, ac_vals = _K_AC_LUMA
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    dht += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes([0xD0, 0xAF]) + b"\xff\xd9"
    )
    w, h, c, out = jpeg_decode(payload)
    assert (w, h, c) == (8, 8, 1)
    assert out == bytes([130] * 64)


def test_flat_blocks_grayscale_exact():
    """quant=8 divides every flat block's DC (8*(v-128)) so the
    reconstruction is mathematically exact — the gate query's oracle
    contract."""
    for w, h, seed in ((8, 8, 0), (24, 16, 7), (40, 8, 201), (16, 32, 99)):
        px = _flat_blocks(w, h, seed)
        assert jpeg_decode(jpeg_encode(w, h, px, 1, quant=8))[3] == px


def test_non_multiple_of_8_dims_roundtrip():
    """Edge-padded dimensions crop back exactly for flat content."""
    img = np.full((11, 13), 77, dtype=np.uint8)
    w, h, c, out = jpeg_decode(jpeg_encode(13, 11, img.tobytes(), 1, quant=8))
    assert (w, h, c) == (13, 11, 1)
    assert out == img.tobytes()


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**20),
)
def test_random_grayscale_error_bound(w, h, seed):
    """Arbitrary content at quant=1 reconstructs within 1 gray level
    (float IDCT rounding is the only loss source)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    rw, rh, rc, out = jpeg_decode(jpeg_encode(w, h, px.tobytes(), 1, quant=1))
    assert (rw, rh, rc) == (w, h, 1)
    got = np.frombuffer(out, np.uint8).astype(int).reshape(h, w)
    assert np.abs(got - px.astype(int)).max() <= 1


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**20), ri=st.integers(1, 3))
def test_restart_markers_roundtrip(seed, ri):
    px = _flat_blocks(32, 16, seed % 256)
    p = jpeg_encode(32, 16, px, 1, quant=8, restart_interval=ri)
    assert b"\xff\xdd" in p  # DRI present
    assert jpeg_decode(p)[3] == px


def test_color_flat_within_rounding():
    """RGB->YCbCr->RGB carries two float roundings; flat color must
    come back within 1 per channel (and the shape/channels exact)."""
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 23, 200, 97
    w, h, c, out = jpeg_decode(jpeg_encode(16, 16, img.tobytes(), 3, quant=1))
    assert (w, h, c) == (16, 16, 3)
    got = np.frombuffer(out, np.uint8).astype(int).reshape(16, 16, 3)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_subsampled_420_flat_decode():
    """A hand-built 4:2:0 16x16 flat-color JPEG (one MCU: 4 Y blocks
    + 1 Cb + 1 Cr, every block DC-only) must decode through the
    subsampling/upsampling path to the exact flat YCbCr
    reconstruction."""
    yv, cbv, crv = 90, 160, 100

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dc_l = _HuffTable(*_K_DC_LUMA)
    dc_c = _HuffTable(*_K_DC_CHROMA)
    ac_l = _HuffTable(*_K_AC_LUMA)
    wtr = _BitWriter()

    def put_dc_block(tab, diff):
        t = 0 if diff == 0 else abs(diff).bit_length()
        code, ln = tab.enc[t]
        wtr.put(code, ln)
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_l.enc[0x00]  # EOB (AC luma table used for all)
        wtr.put(code, ln)

    # 4 Y blocks: first carries the full DC, the rest diff 0
    put_dc_block(dc_l, 8 * (yv - 128))
    for _ in range(3):
        put_dc_block(dc_l, 0)
    put_dc_block(dc_c, 8 * (cbv - 128))
    put_dc_block(dc_c, 8 * (crv - 128))
    wtr.flush()

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling
        + bytes([2, 0x11, 0])  # Cb: 1x1
        + bytes([3, 0x11, 0]),  # Cr: 1x1
    )
    dc_bits, dc_vals = _K_DC_LUMA
    ac_bits, ac_vals = _K_AC_LUMA
    cc_bits, cc_vals = _K_DC_CHROMA
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    dht += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    dht += seg(0xC4, bytes([0x01]) + bytes(cc_bits) + bytes(cc_vals))
    dht += seg(0xC4, bytes([0x11]) + bytes(ac_bits) + bytes(ac_vals))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    payload = b"\xff\xd8" + dqt + sof + dht + sos + bytes(wtr.out) + b"\xff\xd9"

    w, h, c, out = jpeg_decode(payload)
    assert (w, h, c) == (16, 16, 3)
    got = np.frombuffer(out, np.uint8).reshape(16, 16, 3)
    # every pixel identical (flat) and equal to the JFIF inverse
    assert len({tuple(p) for p in got.reshape(-1, 3)}) == 1
    r = round(yv + 1.402 * (crv - 128))
    g = round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128))
    b = round(yv + 1.772 * (cbv - 128))
    assert tuple(got[0, 0]) == (r, g, b)


def test_encoder_420_roundtrip_exact_and_restarts():
    """VERDICT r10 #5: the ENCODER's new 4:2:0 mode — per-block
    constant luma + per-MCU constant chroma must survive the 2x2
    chroma mean, the interleaved 4Y+Cb+Cr MCU schedule, replicate
    upsampling, and the color matrix bit-exactly; restart markers
    inside interleaved MCUs must not shift anything."""
    w, h = 32, 48
    lum = np.zeros((h, w), dtype=np.uint8)
    bw = w // 8
    for i in range(bw * (h // 8)):
        by, bx = divmod(i, bw)
        lum[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = 60 + (17 * i) % 120
    # chroma constant per 16x16 MCU (the exactness envelope)
    cb = np.zeros((h, w), dtype=np.uint8)
    cr = np.zeros((h, w), dtype=np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            cb[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                110 + 9 * (my + mx)
            )
            cr[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                121 + 7 * (my * 2 + mx)
            )
    ycbcr = np.stack([lum, cb, cr], axis=-1)
    outs = []
    for ri in (0, 1, 3):
        payload = jpeg_encode(
            w, h, ycbcr.tobytes(), channels=3, quant=8,
            subsampling="420", pixels_are_ycbcr=True, restart_interval=ri,
        )
        rw, rh, rc, out = jpeg_decode(payload)
        assert (rw, rh, rc) == (w, h, 3)
        outs.append(out)
    assert outs[0] == outs[1] == outs[2]
    got = np.frombuffer(outs[0], np.uint8).reshape(h, w, 3).astype(np.float64)
    yf, cbf, crf = (p.astype(np.float64) for p in (lum, cb, cr))
    exp = np.stack(
        [
            yf + 1.402 * (crf - 128.0),
            yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0),
            yf + 1.772 * (cbf - 128.0),
        ],
        axis=-1,
    )
    assert np.array_equal(got, np.clip(np.round(exp), 0, 255))


def test_encoder_420_and_ycbcr_scope_errors_are_typed():
    px3 = bytes(16 * 16 * 3)
    with pytest.raises(JpegFormatError, match="3 channels"):
        jpeg_encode(16, 16, bytes(16 * 16), channels=1, subsampling="420")
    with pytest.raises(JpegFormatError, match="multiples of 16"):
        jpeg_encode(8, 8, bytes(8 * 8 * 3), channels=3, subsampling="420")
    # 4:2:2 is SUPPORTED since r12 — a 16x16 all-zero image encodes
    # and decodes exactly (flat content survives subsampling)
    assert jpeg_decode(
        jpeg_encode(16, 16, px3, channels=3, subsampling="422")
    )[3] == bytes(16 * 16 * 3)
    with pytest.raises(JpegFormatError, match="not supported"):
        jpeg_encode(16, 16, px3, channels=3, subsampling="411")
    with pytest.raises(JpegFormatError, match="pixels_are_ycbcr"):
        jpeg_encode(16, 16, bytes(16 * 16), channels=1,
                    pixels_are_ycbcr=True)


def test_quarantine_errors_are_typed():
    good = jpeg_encode(8, 8, bytes([100] * 64), 1, quant=8)
    cases = [
        (b"nope", "not a JPEG"),
        # SOF2 is SUPPORTED since r12 — but a baseline stream
        # relabeled progressive carries a full-band Ss=0/Se=63 scan
        # header, which Annex G forbids (DC scans must have Se=0):
        # still a typed quarantine, now for the precise reason
        (good.replace(b"\xff\xc0", b"\xff\xc2", 1),
         "Ss=0 must have Se=0"),
        (good.replace(b"\xff\xc0", b"\xff\xc9", 1), "arithmetic"),
        (good[: len(good) // 2], "ran out|truncated|expected marker"),
    ]
    for bad, why in cases:
        with pytest.raises(JpegFormatError, match=why):
            jpeg_decode(bad)
    # 12-bit precision quarantines
    i = good.index(b"\xff\xc0") + 4
    bad12 = good[:i] + bytes([12]) + good[i + 1 :]
    with pytest.raises(JpegFormatError, match="12-bit"):
        jpeg_decode(bad12)


def _pattern(w: int, h: int, ch: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()


@pytest.mark.parametrize(
    "w,h,ch,sub,ri",
    [
        (8, 8, 1, "444", 0),
        (24, 16, 1, "444", 2),
        (16, 16, 3, "444", 0),
        (16, 16, 3, "420", 0),
        (32, 16, 3, "420", 3),
        (40, 24, 3, "444", 5),
    ],
)
def test_progressive_decode_equals_baseline(w, h, ch, sub, ri):
    """Cross-path identity: a progressive (SOF2) stream of the same
    image carries the same quantized coefficients as the baseline
    stream, so the decoder must reconstruct BIT-IDENTICAL pixels —
    any slip in DC/AC first/refine decode, EOB-run accounting, or
    per-scan restart handling breaks the equality."""
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    px = _pattern(w, h, ch, seed=w * 31 + h * 7 + ch)
    base = jpeg_decode(jpeg_encode(w, h, px, channels=ch, quant=8,
                                   subsampling=sub))
    prog = jpeg_decode(jpeg_encode_progressive(
        w, h, px, channels=ch, quant=8, subsampling=sub,
        restart_interval=ri,
    ))
    assert prog == base


def test_progressive_scan_scripts_and_eob_runs():
    """Alternate scan scripts (spectral-selection-only; deep Al=3
    successive approximation) and EOB-run shapes (flat 64-block run;
    sparse image forcing EOBn > 1 with interleaved correction bits)
    all reconstruct identically to baseline."""
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    w, h = 24, 16
    px = _pattern(w, h, 3, seed=3)
    spectral = [((0, 1, 2), 0, 0, 0, 0),
                ((0,), 1, 9, 0, 0), ((1,), 1, 63, 0, 0),
                ((2,), 1, 63, 0, 0), ((0,), 10, 63, 0, 0)]
    assert jpeg_decode(
        jpeg_encode_progressive(w, h, px, channels=3, quant=8,
                                scans=spectral)
    ) == jpeg_decode(jpeg_encode(w, h, px, channels=3, quant=8))

    px1 = _pattern(w, h, 1, seed=4)
    deep = [((0,), 0, 0, 0, 3), ((0,), 1, 63, 0, 3),
            ((0,), 1, 63, 3, 2), ((0,), 0, 0, 3, 2),
            ((0,), 1, 63, 2, 1), ((0,), 0, 0, 2, 1),
            ((0,), 1, 63, 1, 0), ((0,), 0, 0, 1, 0)]
    assert jpeg_decode(
        jpeg_encode_progressive(w, h, px1, channels=1, quant=8, scans=deep)
    ) == jpeg_decode(jpeg_encode(w, h, px1, channels=1, quant=8))

    flat = bytes([77]) * (64 * 64)
    assert jpeg_decode(
        jpeg_encode_progressive(64, 64, flat, channels=1, quant=8)
    )[3] == flat

    img = np.full((64, 64), 128, np.uint8)
    img[17, 33] = 255
    img[50, 9] = 0
    assert jpeg_decode(
        jpeg_encode_progressive(64, 64, img.tobytes(), channels=1, quant=8)
    ) == jpeg_decode(jpeg_encode(64, 64, img.tobytes(), channels=1, quant=8))


def test_cmyk_ycck_decode_exact_and_quarantine():
    """4-component Adobe JPEG (the only 4-component convention on
    the web): transform 0 (direct inverted CMYK) and transform 2
    (YCCK) both decode to display RGB = round(Cinv*Kinv/255)
    exactly on flat-block content (never an exact .5 — 2*c*k is
    even); the dims probe reports 4 source components while decode
    returns a 3-channel RGB buffer; a 4-component frame WITHOUT the
    APP14 flag quarantines; restarts and progressive scans work."""
    from parquet_to_sql_spark.operators.jpeg import (
        jpeg_dimensions,
        jpeg_encode_progressive,
    )

    w, h = 24, 16
    bw, bh = w // 8, h // 8
    c_p = np.zeros((h, w), np.uint8)
    m_p = np.zeros((h, w), np.uint8)
    y_p = np.zeros((h, w), np.uint8)
    for i in range(bw * bh):
        by, bx = divmod(i, bw)
        c_p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (40 + 29 * i) % 256
        m_p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (90 + 31 * i) % 256
        y_p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (160 + 37 * i) % 256
    kv = 204
    px4 = np.stack([c_p, m_p, y_p, np.full((h, w), kv, np.uint8)], -1)
    pay = jpeg_encode(w, h, px4.tobytes(), channels=4, quant=8,
                      adobe_transform=0)
    rw, rh, rc, out = jpeg_decode(pay)
    assert (rw, rh, rc) == (w, h, 3)
    assert jpeg_dimensions(pay) == (w, h, 4)
    exp = np.round(px4[:, :, :3].astype(np.float64) * kv / 255.0)
    assert np.array_equal(
        np.frombuffer(out, np.uint8).reshape(h, w, 3),
        exp.astype(np.uint8),
    )

    # YCCK: luma blocks + constant chroma offsets through the YCC
    # matrix first, then the K multiply — both stages pinned
    dcb, dcr = -12, 15
    ycck = np.stack(
        [c_p, np.full((h, w), 128 + dcb, np.uint8),
         np.full((h, w), 128 + dcr, np.uint8),
         np.full((h, w), kv, np.uint8)], -1,
    )
    pay2 = jpeg_encode(w, h, ycck.tobytes(), channels=4, quant=8,
                       adobe_transform=2)
    yf = c_p.astype(np.float64)
    cmy = np.clip(np.round(np.stack(
        [yf + 1.402 * dcr, yf - 0.344136 * dcb - 0.714136 * dcr,
         yf + 1.772 * dcb], -1,
    )), 0, 255)
    assert np.array_equal(
        np.frombuffer(jpeg_decode(pay2)[3], np.uint8).reshape(h, w, 3),
        np.round(cmy * kv / 255.0).astype(np.uint8),
    )

    # APP14 stripped -> typed quarantine (channel meaning unknown)
    import struct as _s

    i = pay.find(b"\xff\xee")
    ln = _s.unpack(">H", pay[i + 2 : i + 4])[0]
    with pytest.raises(JpegFormatError, match="Adobe APP14"):
        jpeg_decode(pay[:i] + pay[i + 2 + ln :])

    # restarts + progressive identity, both transforms
    assert jpeg_decode(jpeg_encode(
        w, h, px4.tobytes(), channels=4, quant=8, adobe_transform=0,
        restart_interval=2,
    ))[3] == out
    rng = np.random.RandomState(9)
    for tf in (0, 2):
        rnd = rng.randint(0, 256, size=w * h * 4, dtype=np.uint8).tobytes()
        assert jpeg_decode(jpeg_encode_progressive(
            w, h, rnd, channels=4, quant=8, adobe_transform=tf,
            restart_interval=3,
        )) == jpeg_decode(jpeg_encode(
            w, h, rnd, channels=4, quant=8, adobe_transform=tf,
        ))
    # scope errors
    with pytest.raises(JpegFormatError, match="adobe_transform"):
        jpeg_encode(w, h, px4.tobytes(), channels=4, quant=8)
    with pytest.raises(JpegFormatError, match="4:4:4 only"):
        jpeg_encode(16, 16, bytes(16 * 16 * 4), channels=4,
                    subsampling="420", adobe_transform=0)


def test_422_subsampled_decode_and_progressive_identity():
    """4:2:2 (hs=2, vs=1 — the asymmetric sampling path no other
    fixture reaches): flat per-block luma + whole-image-constant
    chroma decode EXACTLY through the 1x2 chroma mean and
    horizontal-only replicate upsample; progressive 4:2:2 decodes
    bit-identical to baseline 4:2:2 of the same image."""
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    for w, h, ri in ((16, 8, 0), (32, 24, 0), (48, 16, 2)):
        bw, bh = w // 8, h // 8
        lum = np.zeros((h, w), np.uint8)
        for i in range(bw * bh):
            by, bx = divmod(i, bw)
            lum[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                60 + (13 * i) % 120
            )
        ycc = np.stack(
            [lum, np.full((h, w), 110, np.uint8),
             np.full((h, w), 140, np.uint8)], -1,
        )
        p = jpeg_encode(w, h, ycc.tobytes(), 3, quant=8,
                        subsampling="422", pixels_are_ycbcr=True,
                        restart_interval=ri)
        rw, rh, rc, out = jpeg_decode(p)
        assert (rw, rh, rc) == (w, h, 3)
        got = np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(float)
        yf = lum.astype(float)
        dcb, dcr = 110 - 128.0, 140 - 128.0
        exp = np.clip(np.round(np.stack(
            [yf + 1.402 * dcr,
             yf - 0.344136 * dcb - 0.714136 * dcr,
             yf + 1.772 * dcb], -1,
        )), 0, 255)
        assert np.array_equal(got, exp), (w, h, ri)

    for w, h, ri in ((16, 8, 0), (48, 16, 3)):
        px = _pattern(w, h, 3, seed=w + 2 * h)
        assert jpeg_decode(jpeg_encode_progressive(
            w, h, px, 3, quant=8, subsampling="422", restart_interval=ri,
        )) == jpeg_decode(jpeg_encode(w, h, px, 3, quant=8,
                                      subsampling="422"))

    with pytest.raises(JpegFormatError, match="4:2:2 requires"):
        jpeg_encode(24, 8, bytes(24 * 8 * 3), 3, subsampling="422")


@pytest.mark.parametrize("w,h,ri", [(24, 32, 0), (24, 16, 2), (56, 40, 3)])
def test_progressive_420_odd_mcu_dims(w, h, ri):
    """4:2:0 progressive at dimensions that are odd multiples of 8:
    the luma USED block grid (ceil(w/8)) is NARROWER than the
    MCU-padded grid the interleaved DC scan covers, so the
    non-interleaved AC scans must remap block indices across grid
    widths — the block-addressing seam most real-web progressive
    4:2:0 images hit.  Reference: baseline encode of the SAME image
    edge-padded to whole MCUs, decoded and cropped (identical
    quantized coefficients for every block inside the crop)."""
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    px = _pattern(w, h, 3, seed=w + h)
    prog = jpeg_decode(jpeg_encode_progressive(
        w, h, px, channels=3, quant=8, subsampling="420",
        restart_interval=ri,
    ))
    assert prog[:3] == (w, h, 3)
    w16, h16 = -(-w // 16) * 16, -(-h // 16) * 16
    arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    pad = np.pad(arr, ((0, h16 - h), (0, w16 - w), (0, 0)), mode="edge")
    base = jpeg_decode(jpeg_encode(
        w16, h16, pad.tobytes(), channels=3, quant=8, subsampling="420",
    ))
    ref = np.frombuffer(base[3], np.uint8).reshape(h16, w16, 3)[:h, :w]
    assert np.array_equal(
        np.frombuffer(prog[3], np.uint8).reshape(h, w, 3), ref
    )


def test_progressive_hand_derived_fixture_decodes_exactly():
    """Fixed-byte SOF2 stream derived by hand (decoder checked
    independently of the encoder): flat 8x8 gray value 100, quant 8
    -> DC coefficient -28; scan 1 sends the Al=1 point transform
    (-14: category 4 = Annex K code '101', magnitude '0001'), scan 2
    refines with the low bit (0).  Every pixel must come back 100."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
    sof = b"\xff\xc2" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    bits, vals = _K_DC_LUMA
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals)) + bytes(
        [0x00] + bits + vals
    )
    sos1 = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0x01])
    # '101' (cat 4) + '0001' (mag of -14) + 1-pad = 1010 0011
    scan1 = bytes([0xA3])
    sos2 = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0, 0x10])
    # correction bit 0 (-28 & 1) + 1-pad = 0111 1111
    scan2 = bytes([0x7F])
    data = (b"\xff\xd8" + dqt + sof + dht + sos1 + scan1 + sos2 + scan2
            + b"\xff\xd9")
    w, h, c, out = jpeg_decode(data)
    assert (w, h, c) == (8, 8, 1)
    assert out == bytes([100] * 64)


def test_progressive_quarantine_errors_are_typed():
    """Malformed/unsupported progressive structure quarantines with
    the precise reason: AC scan before its DC first scan, bad
    successive-approximation step, and the encoder's own scope
    checks (multi-component AC scan, partial DC scan)."""
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    px = bytes([100] * 64)
    with pytest.raises(JpegFormatError, match="AC scan before"):
        jpeg_decode(jpeg_encode_progressive(
            8, 8, px, channels=1, quant=8, scans=[((0,), 1, 63, 0, 0)]
        ))
    with pytest.raises(JpegFormatError, match="successive approximation"):
        jpeg_decode(jpeg_encode_progressive(
            8, 8, px, channels=1, quant=8,
            scans=[((0,), 0, 0, 0, 0), ((0,), 1, 63, 2, 0)],
        ))
    with pytest.raises(JpegFormatError, match="exactly one component"):
        jpeg_encode_progressive(
            16, 16, bytes([100] * (16 * 16 * 3)), channels=3, quant=8,
            scans=[((0, 1, 2), 0, 0, 0, 0), ((0, 1), 1, 63, 0, 0)],
        )
    with pytest.raises(JpegFormatError, match="all\\s+components"):
        jpeg_encode_progressive(
            16, 16, bytes([100] * (16 * 16 * 3)), channels=3, quant=8,
            scans=[((0,), 0, 0, 0, 0)],
        )


def test_lut16_undefined_ac_symbols_match_fallback_eob():
    """ADVICE r11: AC symbols with size 0 and run 1..14 (rs =
    0x10..0xE0) are undefined in T.81; the canonical fallback walk
    treats them as EOB, so the multi-symbol LUT must encode them
    identically (run 0) — not as runnable ZRL-alikes — or the same
    malformed stream decodes differently depending on whether its
    code+magnitude straddles 16 bits."""
    from parquet_to_sql_spark.operators.jpeg import _lut16

    # 4 codes of length 2 (00,01,10,11): EOB, undefined 0x30, ZRL,
    # and an ordinary run-1/size-2 symbol as a control
    bits = (0, 4) + (0,) * 14
    huffval = (0x00, 0x30, 0xF0, 0x12)
    lut = _lut16(bits, huffval, False)

    def entry(prefix2: int) -> int:
        return lut[prefix2 << 14]

    eob, undef, zrl, run1sz2 = (entry(p) for p in range(4))
    assert eob == 2  # total_bits 2, size 0, run 0
    assert zrl >> 9 == 15 and (zrl >> 5) & 15 == 0  # true ZRL
    assert run1sz2 >> 9 == 1 and (run1sz2 >> 5) & 15 == 2
    # the undefined symbol must carry run 0 (EOB behavior), exactly
    # like the fallback's sz==0 / rs!=0xF0 branch
    assert undef >> 9 == 0 and (undef >> 5) & 15 == 0
    assert undef & 31 == 2


def test_decode_image_features_sniffs_jpeg(spark):
    """decode_image_features(fake=False) now sniffs the payload:
    PNG signature -> png codec, JPEG SOI -> jpeg codec, anything else
    quarantines."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.multimodal import (
        decode_image_features,
        pack_binary,
    )

    px = _flat_blocks(16, 8, 50)
    jp = jpeg_encode(16, 8, px, 1, quant=8)
    from parquet_to_sql_spark.operators.png import png_encode

    pg = png_encode(4, 2, bytes(range(24)), 3)
    df = spark.createDataFrame(
        [("img://a.jpg", jp), ("img://b.png", pg), ("img://c.gif", b"GIF89a")],
        "uri string, data binary",
    )
    packed = pack_binary(df, F.col("data"), F.col("uri"), "image/mixed")
    rows = {
        r.uri: r
        for r in decode_image_features(
            packed, fake=False, on_error="null"
        ).collect()
    }
    exp_luma = sum(px) / len(px) / 255.0
    assert rows["img://a.jpg"].width == 16
    assert rows["img://a.jpg"].channels == 1
    assert abs(rows["img://a.jpg"].mean_luma - exp_luma) < 1e-12
    assert rows["img://b.png"].width == 4
    assert rows["img://c.gif"].width is None  # quarantined


def test_jpeg_dimensions_probe_without_decode():
    """The metadata probe reads SOF dims only — identical answers to
    the full decode, works past fill/standalone markers, reads SOF2
    progressive headers (supported since r12), and raises typed
    errors on arithmetic frames and missing SOF."""
    for w, h, ch in ((8, 8, 1), (24, 16, 1), (16, 16, 3)):
        px = bytes([100] * (w * h * ch))
        payload = jpeg_encode(w, h, px, channels=ch, quant=8)
        assert jpeg_dimensions(payload) == (w, h, ch)
        assert jpeg_decode(payload)[:3] == (w, h, ch)
    base = jpeg_encode(8, 8, bytes([50] * 64), 1, quant=8)
    weird = base[:2] + b"\xff" + b"\xff\x01" + base[2:]
    assert jpeg_dimensions(weird) == (8, 8, 1)
    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    prog = jpeg_encode_progressive(8, 8, bytes([50] * 64), 1, quant=8)
    assert jpeg_dimensions(prog) == (8, 8, 1)
    arith = base.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(JpegFormatError, match="arithmetic"):
        jpeg_dimensions(arith)
    with pytest.raises(JpegFormatError, match="no SOF"):
        jpeg_dimensions(b"\xff\xd8\xff\xd9")


def test_adobe_rgb_3component_quarantines():
    """ADVICE r12: a 3-component frame carrying Adobe APP14
    transform 0 declares its samples are RGB, but the decoder's
    3-component path applies the YCbCr matrix — silently wrong
    colors.  The ambiguity contract is quarantine: transform 0 on a
    3-component frame raises typed JpegFormatError (baseline AND
    progressive scans), while transform 1 (YCC — what the matrix
    actually assumes) decodes bit-identically to the same stream
    without the marker."""
    import struct as _s

    from parquet_to_sql_spark.operators.jpeg import jpeg_encode_progressive

    def with_app14(pay: bytes, transform: int) -> bytes:
        seg = b"Adobe" + b"\x00\x64" + b"\x00\x00" + b"\x00\x00" + bytes(
            [transform]
        )
        return (
            pay[:2] + b"\xff\xee" + _s.pack(">H", len(seg) + 2) + seg
            + pay[2:]
        )

    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    for enc in (jpeg_encode, jpeg_encode_progressive):
        pay = enc(16, 16, px, channels=3, quant=8)
        with pytest.raises(JpegFormatError, match="transform 0"):
            jpeg_decode(with_app14(pay, 0))
        # transform 1 = YCC, exactly the assumed colorspace: harmless
        assert jpeg_decode(with_app14(pay, 1)) == jpeg_decode(pay)

"""Golden tests for the pure-stdlib AVI (RIFF/DIB) codec — the third
real-modality decoder (operators/avi.py), mirrored on the PNG codec's
test conventions: byte-level golden structure, round-trip property,
stride/row-order sensitivity, quarantine error paths, and the
operator-level real frame-sampling path."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_sql_spark.operators.avi import (
    AviFormatError,
    avi_encode,
    avi_frames,
)


def _pattern_frames(w: int, h: int, nf: int, seed: int = 9) -> list[bytes]:
    return [
        bytes((seed * 31 + f * 131 + j * 7) % 256 for j in range(w * h * 3))
        for f in range(nf)
    ]


def test_golden_structure():
    """Hand-check the RIFF framing of a tiny encode: magic, form
    type, header list, movi frames, declared geometry."""
    frames = _pattern_frames(5, 3, 2)
    p = avi_encode(5, 3, frames)
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", p, 4)
    assert riff_size + 8 == len(p)
    assert p[12:16] == b"LIST" and p[20:24] == b"hdrl"
    assert b"00db" in p and b"strf" in p and b"avih" in p
    # BITMAPINFOHEADER geometry: locate strf payload
    i = p.index(b"strf") + 8
    bisz, bw, bh, planes, bits, comp = struct.unpack_from("<IiiHHI", p, i)
    assert (bisz, bw, bh, planes, bits, comp) == (40, 5, 3, 1, 24, 0)


def test_roundtrip_exact():
    w, h, nf = 7, 4, 5  # w*3 = 21 -> stride 24, real padding exercised
    frames = _pattern_frames(w, h, nf)
    rw, rh, out = avi_frames(avi_encode(w, h, frames))
    assert (rw, rh) == (w, h)
    assert out == frames


def test_row_order_and_channel_swap_are_real():
    """The DIB payload must differ from the logical RGB stream (rows
    reversed, BGR) — proving the decoder actually undoes the layout
    rather than copying bytes through."""
    w, h = 4, 2  # stride == w*3, no padding: pure order transform
    frames = _pattern_frames(w, h, 1)
    p = avi_encode(w, h, frames)
    i = p.index(b"00db") + 8
    raw = p[i : i + w * h * 3]
    assert raw != frames[0]
    # bottom row of the DIB is the TOP logical row, blue-first
    top = frames[0][: w * 3]
    dib_last = raw[(h - 1) * w * 3 :]
    assert dib_last[0] == top[2] and dib_last[2] == top[0]


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 6),
    nf=st.integers(1, 6),
    seed=st.integers(0, 2**20),
)
def test_roundtrip_property(w, h, nf, seed):
    frames = [
        bytes((seed + f * 97 + j * 13) % 256 for j in range(w * h * 3))
        for f in range(nf)
    ]
    rw, rh, out = avi_frames(avi_encode(w, h, frames))
    assert (rw, rh, out) == (w, h, frames)


def test_quarantine_errors_are_typed():
    frames = _pattern_frames(4, 3, 2)
    good = avi_encode(4, 3, frames)
    for bad, why in [
        (b"nope", "not a RIFF"),
        (good[:30], "overruns"),
        (good.replace(b"AVI ", b"WAVE", 1), "not an AVI"),
    ]:
        with pytest.raises(AviFormatError, match=why):
            avi_frames(bad)
    # compressed tag (biCompression != 0) quarantines, not guesses
    i = good.index(b"strf") + 8
    comp_off = i + 16
    tampered = (
        good[:comp_off] + struct.pack("<I", 1) + good[comp_off + 4 :]
    )
    with pytest.raises(AviFormatError, match="biCompression=1"):
        avi_frames(tampered)


def test_sample_frames_real_path(spark):
    """sample_frames(fake=False) really decodes the AVI payload:
    sampled sha256 values match hand-decoding the same container."""
    import hashlib

    from parquet_to_sql_spark.operators.multimodal import (
        pack_binary,
        sample_frames,
    )

    w, h, nf = 5, 3, 6
    frames = _pattern_frames(w, h, nf, seed=4)
    payload = avi_encode(w, h, frames)
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("vid://a.avi", payload)], "uri string, data binary"
    )
    packed = pack_binary(df, F.col("data"), F.col("uri"), "video/avi")
    got = {
        (r.frame_index, r.offset_bytes, r.frame_sha256)
        for r in sample_frames(packed, n_frames=3, fake=False).collect()
    }
    want = {
        (idx, idx * w * h * 3, hashlib.sha256(frames[idx]).hexdigest())
        for idx in (0, 2, 4)  # i * 6 // 3 for i in 0..2
    }
    assert got == want


def test_scene_cuts_detect_exactly_one_planted_cut_per_doc(spark):
    """Every fixture doc has ONE +128 scene flip planted at the
    frame midpoint; the detector must flag exactly that pair and
    nothing else for every document."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["multimodal_scene_cuts_real"].build(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    cuts: dict = {}
    for r in rows:
        if r.is_cut:
            cuts.setdefault(r.doc_id, []).append(r.frame_idx)
    docs = {r.doc_id for r in rows}
    assert set(cuts) == docs
    for did, idxs in cuts.items():
        nf = 4 + did % 5
        assert idxs == [nf // 2], (did, idxs)


def test_header_metadata_conventions():
    """ADVICE r09: the encoder's header metadata must be sane for
    EXTERNAL readers too — avih dwFlags must not advertise an idx1
    chunk that is never written, and the stream header must put -1 in
    dwQuality (driver default) with dwSampleSize=0 (video frames vary),
    not the other way around."""
    p = avi_encode(4, 3, _pattern_frames(4, 3, 2))
    i = p.index(b"avih") + 8
    flags = struct.unpack_from("<I", p, i + 12)[0]  # 4th DWORD
    assert flags == 0  # no AVIF_HASINDEX without an idx1 chunk
    j = p.index(b"strh") + 8
    # AVISTREAMHEADER: dwQuality at offset 40, dwSampleSize at 44
    quality = struct.unpack_from("<i", p, j + 40)[0]
    sample_size = struct.unpack_from("<I", p, j + 44)[0]
    assert quality == -1 and sample_size == 0


def test_multi_stream_quarantines():
    """ADVICE r09: a second strl (audio mux / secondary video) must
    raise a typed unsupported-variant error instead of decoding
    stream-0 frames against whichever strf happened to come last."""
    p = avi_encode(4, 3, _pattern_frames(4, 3, 1))
    # graft a copy of the existing strl LIST right after itself
    i = p.index(b"LIST", p.index(b"hdrl"))  # first LIST inside hdrl walk
    # locate the strl LIST: search for the subtype marker
    k = p.index(b"strl") - 8  # LIST header starts 8 bytes before subtype
    (lsz,) = struct.unpack_from("<I", p, k + 4)
    strl_chunk = p[k : k + 8 + lsz]
    grafted = p[: k + 8 + lsz] + strl_chunk + p[k + 8 + lsz :]
    # fix up enclosing sizes: RIFF and hdrl LIST grow by len(strl_chunk)
    grow = len(strl_chunk)
    (riff_sz,) = struct.unpack_from("<I", grafted, 4)
    grafted = bytearray(grafted)
    struct.pack_into("<I", grafted, 4, riff_sz + grow)
    hd = bytes(grafted).index(b"hdrl") - 8
    (hd_sz,) = struct.unpack_from("<I", grafted, hd + 4)
    struct.pack_into("<I", grafted, hd + 4, hd_sz + grow)
    with pytest.raises(AviFormatError, match="multiple streams"):
        avi_frames(bytes(grafted))


def test_sample_frames_null_quarantine(spark):
    """ADVICE r09: sample_frames(fake=False, on_error='null') routes a
    malformed payload to ONE null-feature row instead of failing the
    stage; good payloads in the same batch still decode."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.multimodal import (
        pack_binary,
        sample_frames,
    )

    w, h = 4, 3
    frames = _pattern_frames(w, h, 2)
    good = avi_encode(w, h, frames)
    df = spark.createDataFrame(
        [("vid://good.avi", good), ("vid://bad.avi", b"not a riff at all")],
        "uri string, data binary",
    )
    packed = pack_binary(df, F.col("data"), F.col("uri"), "video/avi")
    rows = sample_frames(packed, n_frames=2, fake=False, on_error="null").collect()
    by_uri = {}
    for r in rows:
        by_uri.setdefault(r.uri, []).append(r)
    assert len(by_uri["vid://good.avi"]) == 2
    (bad,) = by_uri["vid://bad.avi"]
    assert bad.frame_index is None and bad.frame_sha256 is None
    # and the default still fails loud
    with pytest.raises(Exception, match="RIFF"):
        sample_frames(packed, n_frames=2, fake=False).collect()

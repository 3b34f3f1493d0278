"""MP4 / ISO-BMFF box-walk probe (pure stdlib).

The video-container lane of the metadata-probe family (round 13):
a crawl's video stage needs duration, track dimensions, and track
kinds WITHOUT touching sample data — a pure box walk, the
``jpeg_dimensions`` pattern applied to ISO/IEC 14496-12.  Parses:
the box framing (32-bit size, ``largesize`` 64-bit form, and
size==0 to-end-of-file), ``ftyp`` major brand, and the ``moov``
tree — ``mvhd`` (version 0 and 1 layouts: timescale + duration),
per-``trak`` ``tkhd`` (16.16 fixed-point width/height, both
versions) and ``hdlr`` handler type (``vide``/``soun``/other).
Truncated boxes, missing moov/mvhd, and zero timescales raise
typed ``Mp4FormatError`` for quarantine.

The builder writes minimal valid fixtures (real box framing, no
media data).  Reference parity note: the reference repo has no
media handling (SURVEY.md §2.C)."""

from __future__ import annotations

import struct


class Mp4FormatError(ValueError):
    """Raised for malformed/unsupported ISO-BMFF structures; the
    message names the reason for quarantine grouping."""


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes spanning
    [start, end), handling largesize and size==0 framing."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise Mp4FormatError("truncated box header")
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4FormatError(
                f"box {fourcc.decode('latin1')!r} size {size} out of range"
            )
        yield fourcc, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia"}


def mp4_probe(data: bytes) -> dict:
    """Box-walk an MP4 -> {"brand", "timescale", "duration_ms",
    "n_tracks", "width", "height", "has_video", "has_audio"} —
    width/height from the FIRST video track's tkhd (16.16 fixed,
    integer-floored)."""
    if len(data) < 8:
        raise Mp4FormatError("too short for a box header")
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False

    def parse_trak(start: int, end: int) -> tuple[
        tuple[int, int] | None, bytes | None
    ]:
        """Collect (dims from tkhd, handler kind from mdia/hdlr)
        across the whole trak subtree."""
        dims = kind = None
        for fourcc, b0, b1 in _boxes(data, start, end):
            if fourcc == b"tkhd":
                ver = data[b0]
                off = b0 + (96 if ver == 1 else 84)
                if off + 8 > b1:
                    raise Mp4FormatError("truncated tkhd")
                (w_fx,) = struct.unpack(">I", data[off : off + 4])
                (h_fx,) = struct.unpack(">I", data[off + 4 : off + 8])
                dims = (w_fx >> 16, h_fx >> 16)
            elif fourcc == b"hdlr":
                if b1 - b0 < 12:
                    raise Mp4FormatError("truncated hdlr")
                if kind is None:
                    kind = data[b0 + 8 : b0 + 12]
            elif fourcc in _CONTAINERS:
                sub_dims, sub_kind = parse_trak(b0, b1)
                dims = dims if sub_dims is None else sub_dims
                kind = kind if sub_kind is None else (
                    kind or sub_kind
                )
        return dims, kind

    def walk(start: int, end: int) -> None:
        nonlocal brand, timescale, duration, n_tracks
        nonlocal width, height, has_video, has_audio
        for fourcc, b0, b1 in _boxes(data, start, end):
            if fourcc == b"ftyp":
                if b1 - b0 < 4:
                    raise Mp4FormatError("truncated ftyp")
                brand = data[b0 : b0 + 4].decode("latin1")
            elif fourcc == b"mvhd":
                if b1 - b0 < 4:
                    raise Mp4FormatError("truncated mvhd")
                ver = data[b0]
                if ver == 0:
                    if b1 - b0 < 20:
                        raise Mp4FormatError("truncated mvhd v0")
                    timescale, duration = struct.unpack(
                        ">II", data[b0 + 12 : b0 + 20]
                    )
                elif ver == 1:
                    if b1 - b0 < 28:
                        raise Mp4FormatError("truncated mvhd v1")
                    (timescale,) = struct.unpack(
                        ">I", data[b0 + 20 : b0 + 24]
                    )
                    (duration,) = struct.unpack(
                        ">Q", data[b0 + 24 : b0 + 32]
                    )
                else:
                    raise Mp4FormatError(f"mvhd version {ver}")
            elif fourcc == b"trak":
                n_tracks += 1
                dims, kind = parse_trak(b0, b1)
                if kind == b"vide":
                    has_video = True
                    if width is None and dims is not None:
                        width, height = dims
                elif kind == b"soun":
                    has_audio = True
            elif fourcc == b"moov":
                walk(b0, b1)

    walk(0, len(data))
    if timescale is None:
        raise Mp4FormatError("no moov/mvhd found")
    if timescale == 0:
        raise Mp4FormatError("zero mvhd timescale")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
    }


def _box(fourcc: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (
            struct.pack(">I", 1) + fourcc
            + struct.pack(">Q", 16 + len(body)) + body
        )
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def mp4_build(
    timescale: int,
    duration: int,
    tracks: list[dict],
    brand: str = "isom",
    mvhd_v1: bool = False,
    largesize_moov: bool = False,
) -> bytes:
    """Minimal valid ISO-BMFF: ftyp + moov(mvhd + trak(tkhd+mdia/
    hdlr)...).  Each track dict: {"kind": "vide"|"soun", "width",
    "height"} (dims used for vide)."""
    if mvhd_v1:
        mvhd = _box(
            b"mvhd",
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration) + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", timescale, duration) + b"\x00" * 80,
        )
    traks = b""
    for t in tracks:
        w, h = t.get("width", 0), t.get("height", 0)
        tkhd = _box(
            b"tkhd",
            b"\x00" * 4 + b"\x00" * 80
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(
            b"hdlr",
            b"\x00" * 8 + t["kind"].encode("ascii") + b"\x00" * 14,
        )
        traks += _box(b"trak", tkhd + _box(b"mdia", hdlr))
    moov = _box(b"moov", mvhd + traks, largesize=largesize_moov)
    return _box(b"ftyp", brand.encode("ascii") + b"\x00\x00\x00\x00") + moov

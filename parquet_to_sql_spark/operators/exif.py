"""Pure-stdlib EXIF (TIFF-in-APP1) reader + GPS strip for JPEG.

Crawl images carry EXIF metadata, and the privacy-relevant part is
GPS: a training pipeline must DETECT location tags and STRIP them
before anything ships (the binary-side sibling of the text PII
scrub).  This module walks JPEG marker segments, parses the Exif
APP1 payload per the public TIFF 6.0 / EXIF specs — byte-order
header (II/MM), IFD0 entry table, the GPS sub-IFD pointer (tag
0x8825) — and can remove every APP1 segment without touching the
entropy-coded image data (re-encode-free strip: the image bytes stay
bit-identical, only metadata segments disappear).

Scope (documented, asserted): baseline JPEG marker framing, Exif
APP1 with Intel or Motorola byte order, IFD0 scalar tags
(orientation 0x0112, make 0x010F) and the GPS pointer.  Malformed
TIFF structures raise :class:`ExifFormatError` naming the reason
(quarantine, never a guess); JPEGs without EXIF parse to an empty
record.  A minimal writer synthesizes spec-shaped APP1 payloads so
tests and the gate query can build fixtures executor-side.

Reference parity note: the reference repo has no media handling;
this is mandated LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

import struct


class ExifFormatError(ValueError):
    """Malformed Exif/TIFF structures; message names the reason."""


_TAG_ORIENTATION = 0x0112
_TAG_MAKE = 0x010F
_TAG_GPS_IFD = 0x8825


def exif_build_app1(
    orientation: int = 1,
    make: str = "",
    with_gps: bool = False,
    little_endian: bool = True,
) -> bytes:
    """One spec-shaped Exif APP1 segment (marker + length + 'Exif\\0\\0'
    + TIFF): IFD0 with Orientation, optional Make (ASCII, out-of-line
    when > 4 bytes), optional GPS sub-IFD (LatitudeRef 'N' +
    a 3-RATIONAL Latitude)."""
    e = "<" if little_endian else ">"
    entries = []
    tail = bytearray()  # out-of-line values, appended after the IFD

    def entry(tag, typ, count, value_bytes, inline):
        entries.append((tag, typ, count, value_bytes, inline))

    entry(_TAG_ORIENTATION, 3, 1,
          struct.pack(e + "H", orientation) + b"\x00\x00", True)
    if make:
        mb = make.encode("ascii") + b"\x00"
        if len(mb) <= 4:
            entry(_TAG_MAKE, 2, len(mb), mb.ljust(4, b"\x00"), True)
        else:
            entry(_TAG_MAKE, 2, len(mb), mb, False)
    gps_ifd = b""
    if with_gps:
        # GPS IFD built below once offsets are known; reserve entry
        entry(_TAG_GPS_IFD, 4, 1, b"", False)

    # layout: TIFF header (8) + IFD0 (2 + 12n + 4) + tail data
    n = len(entries)
    ifd0_size = 2 + 12 * n + 4
    data_off = 8 + ifd0_size

    out_entries = b""
    for tag, typ, count, vb, inline in entries:
        head = struct.pack(e + "HHI", tag, typ, count)
        if tag == _TAG_GPS_IFD:
            gps_off = data_off + len(tail)
            # GPS IFD: 2 entries — GPSLatitudeRef (ASCII 2, inline),
            # GPSLatitude (RATIONAL 3, out-of-line)
            lat_data_off = gps_off + 2 + 12 * 2 + 4
            gps_ifd = struct.pack(e + "H", 2)
            gps_ifd += struct.pack(e + "HHI", 0x0001, 2, 2) + b"N\x00\x00\x00"
            gps_ifd += struct.pack(e + "HHI", 0x0002, 5, 3) + struct.pack(
                e + "I", lat_data_off
            )
            gps_ifd += struct.pack(e + "I", 0)  # next IFD
            gps_ifd += struct.pack(e + "IIIIII", 37, 1, 46, 1, 30, 1)
            out_entries += head + struct.pack(e + "I", gps_off)
            tail += gps_ifd
        elif inline:
            out_entries += head + vb
        else:
            out_entries += head + struct.pack(e + "I", data_off + len(tail))
            tail += vb
    ifd0 = struct.pack(e + "H", n) + out_entries + struct.pack(e + "I", 0)
    tiff = (
        (b"II" if little_endian else b"MM")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + ifd0
        + bytes(tail)
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def exif_inject(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _jpeg_segments(jpeg: bytes):
    """Yield (marker, start, end) for each LENGTH-BEARING marker
    segment up to SOS; the entropy-coded tail is not walked (strip
    never touches it).  Mirrors jpeg_decode's marker loop (ADVICE
    r10): 0xFF fill bytes before a marker (T.81 B.1.1.2) are skipped,
    and standalone markers (TEM 0x01, RST0-7) are passed over without
    reading a length — treating them as length-bearing would misread
    adjacent bytes as a segment length and mis-slice valid JPEGs."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifFormatError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 2 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ExifFormatError(f"expected marker at byte {pos}")
        if jpeg[pos + 1] == 0xFF:  # legal fill byte, not a marker
            pos += 1
            continue
        marker = jpeg[pos + 1]
        if marker == 0xD9 or marker == 0xDA:
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone: no length field follows
            continue
        if pos + 4 > len(jpeg):
            raise ExifFormatError("truncated marker segment")
        (seglen,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        yield marker, pos, pos + 2 + seglen
        pos += 2 + seglen


def exif_parse(jpeg: bytes) -> dict:
    """Parse the first Exif APP1 of a JPEG ->
    ``{"has_exif", "byte_order", "orientation", "make", "has_gps",
    "n_app1_segments"}``; JPEGs without EXIF return has_exif=False
    with NULL-ish fields.  Raises ExifFormatError on malformed TIFF
    structures inside a present Exif segment."""
    out = {
        "has_exif": False, "byte_order": None, "orientation": None,
        "make": None, "has_gps": False, "n_app1_segments": 0,
    }
    for marker, start, end in _jpeg_segments(jpeg):
        if marker != 0xE1:
            continue
        out["n_app1_segments"] += 1
        body = jpeg[start + 4 : end]
        if not body.startswith(b"Exif\x00\x00") or out["has_exif"]:
            continue  # XMP or a second Exif: counted, not parsed
        tiff = body[6:]
        if len(tiff) < 8:
            raise ExifFormatError("truncated TIFF header")
        order = tiff[:2]
        if order == b"II":
            e = "<"
        elif order == b"MM":
            e = ">"
        else:
            raise ExifFormatError(f"bad TIFF byte order {order!r}")
        (magic,) = struct.unpack_from(e + "H", tiff, 2)
        if magic != 42:
            raise ExifFormatError(f"bad TIFF magic {magic}")
        (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
        if ifd0 + 2 > len(tiff):
            raise ExifFormatError("IFD0 offset past segment end")
        (n,) = struct.unpack_from(e + "H", tiff, ifd0)
        out["has_exif"] = True
        out["byte_order"] = "II" if e == "<" else "MM"
        for i in range(n):
            base = ifd0 + 2 + 12 * i
            if base + 12 > len(tiff):
                raise ExifFormatError(f"IFD0 entry {i} truncated")
            tag, typ, count = struct.unpack_from(e + "HHI", tiff, base)
            if tag == _TAG_ORIENTATION and typ == 3:
                (out["orientation"],) = struct.unpack_from(
                    e + "H", tiff, base + 8
                )
            elif tag == _TAG_MAKE and typ == 2:
                if count <= 4:
                    raw = tiff[base + 8 : base + 8 + count]
                else:
                    (off,) = struct.unpack_from(e + "I", tiff, base + 8)
                    if off + count > len(tiff):
                        raise ExifFormatError("Make value past segment end")
                    raw = tiff[off : off + count]
                out["make"] = raw.split(b"\x00")[0].decode("ascii", "replace")
            elif tag == _TAG_GPS_IFD:
                out["has_gps"] = True
    return out


def exif_strip(jpeg: bytes) -> bytes:
    """Remove every APP1 segment (Exif AND XMP ride APP1) without
    touching any other byte — the image's entropy-coded data stays
    bit-identical, so decode-before == decode-after is testable."""
    spans = [
        (start, end)
        for marker, start, end in _jpeg_segments(jpeg)
        if marker == 0xE1
    ]
    if not spans:
        return jpeg
    out = bytearray()
    pos = 0
    for start, end in spans:
        out += jpeg[pos:start]
        pos = end
    out += jpeg[pos:]
    return bytes(out)


def exif_apply_orientation(pixels, width, height, channels, orientation):
    """Apply a parsed Exif orientation (tag 0x0112, values 1-8) to
    decoded pixels so the image displays upright — the normalization
    a training pipeline runs right after decode (models should not
    have to learn that a camera was held sideways).  ``pixels`` is
    the row-major decoded buffer; returns ``(upright_bytes, out_w,
    out_h)`` with dimensions swapped for the four transposed
    orientations (5-8).  Values outside 1-8 raise
    :class:`ExifFormatError` (quarantine — guessing a rotation
    corrupts every downstream crop/phash).

    Semantics per the Exif 2.3 table, as numpy views (zero-copy
    until the final contiguous serialization): 2 mirror, 3 rotate
    180, 4 flip vertical, 5 transpose, 6 rotate 90 CW, 7 transverse,
    8 rotate 90 CCW."""
    import numpy as np

    if not 1 <= int(orientation) <= 8:
        raise ExifFormatError(f"orientation {orientation} outside 1..8")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    o = int(orientation)
    if o == 2:
        out = img[:, ::-1]
    elif o == 3:
        out = img[::-1, ::-1]
    elif o == 4:
        out = img[::-1, :]
    elif o == 5:
        out = img.swapaxes(0, 1)
    elif o == 6:
        out = img.swapaxes(0, 1)[:, ::-1]
    elif o == 7:
        out = img.swapaxes(0, 1)[::-1, ::-1]
    elif o == 8:
        out = img.swapaxes(0, 1)[::-1, :]
    else:
        out = img
    return (
        np.ascontiguousarray(out).tobytes(),
        out.shape[1],
        out.shape[0],
    )


def tiff_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, samples-per-pixel) from a RAW TIFF's IFD0 —
    the ``jpeg_dimensions`` routing-probe pattern for the next
    archive format over (TIFF scans/datasets); no strip data is
    touched.  Reuses the same IFD walk discipline as exif_parse
    (Exif IS a TIFF IFD embedded in JPEG APP1).  Tags: ImageWidth
    256 / ImageLength 257 (SHORT or LONG), SamplesPerPixel 277
    (default 1 per the TIFF 6.0 spec).  Raises ExifFormatError for
    malformed headers or when either dimension tag is absent."""
    if len(data) < 8:
        raise ExifFormatError("truncated TIFF header")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ExifFormatError(f"bad TIFF byte order {order!r}")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ExifFormatError(f"bad TIFF magic {magic}")
    (ifd0,) = struct.unpack_from(e + "I", data, 4)
    if ifd0 + 2 > len(data):
        raise ExifFormatError("IFD0 offset past file end")
    (n,) = struct.unpack_from(e + "H", data, ifd0)
    width = height = None
    spp = 1
    for i in range(n):
        base = ifd0 + 2 + 12 * i
        if base + 12 > len(data):
            raise ExifFormatError(f"IFD0 entry {i} truncated")
        tag, typ, count = struct.unpack_from(e + "HHI", data, base)
        if tag in (256, 257, 277):
            if typ == 3:
                (val,) = struct.unpack_from(e + "H", data, base + 8)
            elif typ == 4:
                (val,) = struct.unpack_from(e + "I", data, base + 8)
            else:
                raise ExifFormatError(
                    f"tag {tag} has non-integer type {typ}"
                )
            if tag == 256:
                width = val
            elif tag == 257:
                height = val
            else:
                spp = val
    if width is None or height is None:
        raise ExifFormatError("TIFF lacks ImageWidth/ImageLength tags")
    if width == 0 or height == 0:
        raise ExifFormatError("zero-dimension TIFF")
    return width, height, spp


def tiff_build_header(
    width: int, height: int, spp: int = 3, big_endian: bool = False
) -> bytes:
    """Minimal single-IFD TIFF header block for probe fixtures:
    ImageWidth/ImageLength (LONG) + SamplesPerPixel (SHORT), no
    strip data (the probe never reads any)."""
    e = ">" if big_endian else "<"
    entries = [
        (256, 4, 1, struct.pack(e + "I", width)),
        (257, 4, 1, struct.pack(e + "I", height)),
        (277, 3, 1, struct.pack(e + "H", spp) + b"\x00\x00"),
    ]
    out = bytearray((b"MM" if big_endian else b"II"))
    out += struct.pack(e + "H", 42)
    out += struct.pack(e + "I", 8)  # IFD0 right after the header
    out += struct.pack(e + "H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(e + "HHI", tag, typ, count) + value
    out += struct.pack(e + "I", 0)  # no next IFD
    return bytes(out)

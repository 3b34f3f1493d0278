"""ZIP reader/writer (pure stdlib, hand-parsed; round 13).

The sibling of the ustar walk (operators/tar.py): dataset drops and
document dumps ship as ``.zip`` at least as often as ``.tar``, and
the 100 TB ingest shape is identical — binaryFile scan, one task
per archive, a per-archive member walk.  Hand-parsed rather than
wrapped: End-Of-Central-Directory discovery (backward scan through
a possible trailing comment), central-directory entry walk
(PK\\x01\\x02 signatures, name/extra/comment skips, local-header
offsets), local-header validation (PK\\x03\\x04, its OWN name/extra
lengths — they legally differ from the CD's), STORE and DEFLATE
(raw, wbits=-15 via zlib) payloads, and CRC-32 + size verification
on extraction.  Encrypted members, zip64 markers, and other
compression methods raise typed ``ZipFormatError`` quarantines.

Cross-validated against the stdlib ``zipfile`` module in BOTH
directions (tests/test_zip_source.py).  Reference parity note: the
reference reads parquet only; this is mandated LLM-pipeline
extension surface (SURVEY.md §2.C sources)."""

from __future__ import annotations

import struct
import zlib


class ZipFormatError(ValueError):
    """Raised for malformed/unsupported ZIP structures; the message
    names the reason for quarantine grouping."""


_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


def zip_entries(data: bytes) -> list[dict]:
    """Walk the central directory -> [{"name", "method" ("store"|
    "deflate"), "size", "comp_size", "crc32", "offset"}]."""
    if len(data) < 22:
        raise ZipFormatError("too short for an EOCD record")
    # EOCD: last 22..22+65535 bytes (trailing archive comment)
    tail = data[-(22 + 65535):] if len(data) > 22 + 65535 else data
    idx = tail.rfind(_EOCD_SIG)
    if idx == -1:
        raise ZipFormatError("no end-of-central-directory signature")
    eocd = tail[idx:]
    if len(eocd) < 22:
        raise ZipFormatError("truncated EOCD record")
    n_here, n_total, cd_size, cd_off = struct.unpack(
        "<HHII", eocd[8:20]
    )
    if n_here == 0xFFFF or cd_off == 0xFFFFFFFF:
        raise ZipFormatError("zip64 archives not supported; quarantine")
    if n_here != n_total:
        raise ZipFormatError("multi-disk archives not supported")
    if cd_off + cd_size > len(data):
        raise ZipFormatError("central directory past archive end")
    out = []
    pos = cd_off
    for _ in range(n_total):
        if data[pos : pos + 4] != _CD_SIG:
            raise ZipFormatError(
                f"bad central-directory signature at {pos}"
            )
        if pos + 46 > len(data):
            raise ZipFormatError("truncated central-directory entry")
        (flags, method) = struct.unpack("<HH", data[pos + 8 : pos + 12])
        crc, comp_size, size = struct.unpack(
            "<III", data[pos + 16 : pos + 28]
        )
        name_len, extra_len, comment_len = struct.unpack(
            "<HHH", data[pos + 28 : pos + 34]
        )
        (offset,) = struct.unpack("<I", data[pos + 42 : pos + 46])
        name = data[pos + 46 : pos + 46 + name_len].decode(
            "utf-8", "replace"
        )
        if flags & 0x1:
            raise ZipFormatError(
                f"encrypted member {name!r}; quarantine"
            )
        if method == 0:
            mlabel = "store"
        elif method == 8:
            mlabel = "deflate"
        else:
            raise ZipFormatError(
                f"compression method {method} not supported "
                f"for {name!r}; quarantine"
            )
        out.append(
            {"name": name, "method": mlabel, "size": size,
             "comp_size": comp_size, "crc32": crc, "offset": offset}
        )
        pos += 46 + name_len + extra_len + comment_len
    return out


def zip_extract(data: bytes, entry: dict) -> bytes:
    """Extract one entry via its local header; verifies CRC-32 and
    the uncompressed size."""
    pos = entry["offset"]
    if data[pos : pos + 4] != _LOCAL_SIG:
        raise ZipFormatError(
            f"bad local-header signature for {entry['name']!r}"
        )
    name_len, extra_len = struct.unpack(
        "<HH", data[pos + 26 : pos + 30]
    )
    start = pos + 30 + name_len + extra_len
    raw = data[start : start + entry["comp_size"]]
    if len(raw) != entry["comp_size"]:
        raise ZipFormatError(f"truncated payload for {entry['name']!r}")
    if entry["method"] == "store":
        out = raw
    else:
        try:
            out = zlib.decompress(raw, -15)
        except zlib.error as exc:
            raise ZipFormatError(
                f"bad deflate stream for {entry['name']!r}: {exc}"
            )
    if len(out) != entry["size"]:
        raise ZipFormatError(
            f"size mismatch for {entry['name']!r} "
            f"({len(out)} != {entry['size']})"
        )
    if zlib.crc32(out) & 0xFFFFFFFF != entry["crc32"]:
        raise ZipFormatError(f"CRC-32 mismatch for {entry['name']!r}")
    return out


def zip_build(members: list[tuple[str, bytes, str]]) -> bytes:
    """Write a ZIP of [(name, content, "store"|"deflate")] with a
    correct central directory (deterministic: zeroed DOS times)."""
    out = bytearray()
    cd = bytearray()
    for name, content, method in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if method == "store":
            raw, mcode = content, 0
        elif method == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = comp.compress(content) + comp.flush()
            mcode = 8
        else:
            raise ZipFormatError(f"unknown method {method!r}")
        offset = len(out)
        common = struct.pack(
            "<HHHHHIII", 20, 0, mcode, 0, 0, crc, len(raw), len(content)
        )
        out += _LOCAL_SIG + common + struct.pack("<HH", len(nb), 0) + nb
        out += raw
        cd += _CD_SIG + struct.pack("<H", 20) + common
        cd += struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0, 0, offset)
        cd += nb
    cd_off = len(out)
    out += cd
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(cd), cd_off, 0
    )
    return bytes(out)

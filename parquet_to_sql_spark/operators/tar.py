"""POSIX ustar reader/writer (pure stdlib, hand-parsed).

Round 13: the WebDataset convention — tar shards whose members pair
``<key>.txt`` / ``<key>.png`` / ``<key>.json`` per sample — is the
de-facto shipping format for multimodal training data, and a 100 TB
ingest reads those shards exactly like the ``.warc.gz`` crawl
shards: binaryFile scan, one task per shard, a per-shard member
walk, zero corpus shuffle.  This module hand-parses the ustar
layout (512-byte headers, NUL/space-terminated octal fields, the
name+prefix split, checksum validation with the checksum field
blanked, 512-byte content padding, the two-zero-block terminator)
rather than wrapping ``tarfile`` so the framing itself sits under
the driver's hash gates and malformed shards raise typed
``TarFormatError`` quarantines instead of library-dependent
surprises.

Reference parity note: the reference repo reads parquet only; this
is mandated LLM-pipeline extension surface (SURVEY.md §2.C
sources)."""

from __future__ import annotations


class TarFormatError(ValueError):
    """Raised for malformed ustar framing; the message names the
    reason for quarantine grouping."""


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise TarFormatError(f"bad octal {what} field {field!r}")


def tar_members(data: bytes) -> list[dict]:
    """Walk a ustar archive -> [{"name", "size", "typeflag",
    "content"}] for regular files (typeflags '0' and NUL);
    directories and other types are reported with content=None.
    Validates every header checksum."""
    out = []
    pos = 0
    n = len(data)
    while pos + 512 <= n:
        hdr = data[pos : pos + 512]
        if hdr == b"\x00" * 512:
            # terminator: expect a second zero block (tolerate EOF)
            return out
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        size = _octal(hdr[124:136], "size")
        chksum = _octal(hdr[148:156], "checksum")
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        computed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if computed != chksum:
            raise TarFormatError(
                f"checksum mismatch for {name!r} "
                f"({computed} != {chksum})"
            )
        if hdr[257:263] == b"ustar\x00" or hdr[257:262] == b"ustar":
            prefix = hdr[345:500].split(b"\x00")[0].decode(
                "utf-8", "replace"
            )
            if prefix:
                name = prefix + "/" + name
        pos += 512
        content = None
        if typeflag == "0":
            if pos + size > n:
                raise TarFormatError(f"truncated content for {name!r}")
            content = data[pos : pos + size]
        pos += (size + 511) & ~511
        out.append(
            {"name": name, "size": size, "typeflag": typeflag,
             "content": content}
        )
    raise TarFormatError("archive ended without a zero-block terminator")


def tar_build(members: list[tuple[str, bytes]]) -> bytes:
    """Write a ustar archive of regular files: [(name, content)]."""
    out = bytearray()
    for name, content in members:
        nb = name.encode("utf-8")
        prefix = b""
        if len(nb) > 100:
            # earliest slash that leaves <= 100 name bytes
            cut = nb.find(b"/", max(0, len(nb) - 101))
            if cut == -1 or len(nb) - cut - 1 > 100 or cut > 155:
                raise TarFormatError(f"name too long for ustar: {name!r}")
            prefix, nb = nb[:cut], nb[cut + 1 :]
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(content):011o}\x00".encode("ascii")
        hdr[136:148] = b"00000000000\x00"  # mtime 0: deterministic
        hdr[148:156] = b" " * 8
        hdr[156] = ord("0")
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        hdr[345:345 + len(prefix)] = prefix
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode("ascii")
        out += hdr
        out += content
        out += b"\x00" * ((512 - len(content) % 512) % 512)
    out += b"\x00" * 1024
    return bytes(out)

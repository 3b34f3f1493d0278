"""Pure-stdlib WARC (Web ARChive) reader + minimal writer.

WARC is THE container format web crawls actually arrive in (Common
Crawl publishes nothing else), so a training-data engine needs to
ingest it natively: this module parses WARC/1.0 and WARC/1.1 records
per the public ISO 28500 spec — version line, named headers,
Content-Length-framed block, CRLF CRLF record terminator — from
either a plain byte payload or the gzip form crawls really use (one
gzip MEMBER per record, members concatenated; stdlib ``zlib`` handles
the member walk, same dependency footprint as the PNG codec).

Scope (documented, asserted): well-formed records with a
Content-Length header; response/request/metadata/warcinfo/resource/
conversion record types pass through with their headers.  Malformed
framing (bad version line, missing Content-Length, truncated block,
missing terminator, corrupt gzip) raises :class:`WarcFormatError`
naming the reason — the same typed-quarantine contract as the media
codecs: a 100 TB ingest routes broken records, it never guesses.

The writer exists so tests and the gate query can synthesize
deterministic fixtures executor-side; it emits spec-shaped records
(WARC/1.0, mandatory WARC-Type / WARC-Record-ID / WARC-Date /
Content-Length) in plain or per-record-gzip-member form.

Reference parity note: the reference repo has no crawl ingestion;
this is mandated LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

import zlib


class WarcFormatError(ValueError):
    """Malformed WARC framing; message names the reason for
    quarantine-bucket grouping."""


_CRLF = b"\r\n"


def warc_write_record(
    warc_type: str,
    uri: str,
    content: bytes,
    record_id: str,
    date: str = "2024-01-01T00:00:00Z",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record: version line, headers,
    Content-Length-framed block, CRLF CRLF terminator."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", uri),
        ("Content-Length", str(len(content))),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = b"WARC/1.0" + _CRLF
    head += b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers
    )
    return head + _CRLF + content + _CRLF + _CRLF


def warc_gzip_members(records: list[bytes]) -> bytes:
    """The crawl wire form: each record its own gzip member,
    members concatenated (ISO 28500 annex / Common Crawl layout)."""
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out += co.compress(rec) + co.flush()
    return bytes(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Inflate concatenated gzip members to one plain byte stream."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(payload[pos:])
        except zlib.error as exc:
            raise WarcFormatError(f"corrupt gzip member at {pos}: {exc}")
        if not d.eof:
            # stream ended mid-member (missing deflate tail or gzip
            # CRC/ISIZE trailer) — zlib returns partial output
            # silently, which would pass truncation through as data
            raise WarcFormatError(f"truncated gzip member at {pos}")
        tail = len(d.unused_data)
        if tail == 0:
            break
        pos = len(payload) - tail
    return bytes(out)


def warc_records(payload: bytes) -> list[dict]:
    """Parse a WARC payload (plain or gzip-member form) into records:
    ``[{"warc_type", "uri", "record_id", "date", "content"}, ...]``.

    Raises :class:`WarcFormatError` on any framing violation —
    wrong magic, headerless records, missing/invalid Content-Length,
    truncated blocks, missing CRLF CRLF terminators."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    if not payload:
        raise WarcFormatError("empty payload")
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"WARC/":
            raise WarcFormatError(
                f"record {len(records)}: bad version line at {pos} "
                f"({payload[pos:pos + 5]!r})"
            )
        hdr_end = payload.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise WarcFormatError(
                f"record {len(records)}: unterminated header block"
            )
        head = payload[pos:hdr_end].decode("utf-8", "strict")
        lines = head.split("\r\n")
        version = lines[0]
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise WarcFormatError(
                f"record {len(records)}: unsupported version {version!r}"
            )
        # unfold continuation lines first (ISO 28500 grammar: a header
        # value may wrap onto following lines that start with SP/HTAB;
        # ADVICE r10 — rejecting them quarantined valid records)
        unfolded: list[str] = []
        for line in lines[1:]:
            if line[:1] in (" ", "\t"):
                if not unfolded:
                    raise WarcFormatError(
                        f"record {len(records)}: continuation line "
                        f"before any header field"
                    )
                unfolded[-1] += " " + line.strip()
            else:
                unfolded.append(line)
        fields: dict[str, str] = {}
        for line in unfolded:
            k, sep, v = line.partition(":")
            if not sep:
                raise WarcFormatError(
                    f"record {len(records)}: malformed header {line!r}"
                )
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise WarcFormatError(
                f"record {len(records)}: missing Content-Length"
            )
        try:
            clen = int(fields["content-length"])
        except ValueError:
            raise WarcFormatError(
                f"record {len(records)}: bad Content-Length "
                f"{fields['content-length']!r}"
            )
        if clen < 0:
            raise WarcFormatError(
                f"record {len(records)}: negative Content-Length"
            )
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise WarcFormatError(
                f"record {len(records)}: truncated block "
                f"(need {clen} + terminator, have {n - body_start})"
            )
        if payload[body_end : body_end + 4] != _CRLF + _CRLF:
            raise WarcFormatError(
                f"record {len(records)}: missing CRLF CRLF terminator"
            )
        records.append(
            {
                "warc_type": fields.get("warc-type", ""),
                "uri": fields.get("warc-target-uri", ""),
                "record_id": fields.get("warc-record-id", ""),
                "date": fields.get("warc-date", ""),
                "content": payload[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records

"""Stdlib HTTP/1.x response parsing for crawl ingestion.

Real crawls store the RAW HTTP response inside each WARC response
record — status line, header fields, CRLF CRLF, body — not bare
HTML (Common Crawl's response WARCs are exactly this wire form).
This module parses it with the same contract as the WARC / HTML /
JPEG parsers beside it: pure stdlib, deterministic, and a TYPED
:class:`HttpFormatError` naming the reason on every framing
violation so a pipeline quarantines instead of guessing.

Scope (documented, asserted): HTTP/1.0 and HTTP/1.1 status lines
(RFC 9112 §4), case-insensitive header fields with obs-fold
continuation-line unfolding (§5.2), duplicate field-lines combined
with ", " (RFC 9110 §5.2), chunked transfer-coding decode with
chunk extensions and trailer fields (§7.1), Content-Length body
framing (exact — short raises truncation, trailing garbage raises),
close-delimited bodies when neither framing header is present, and
media-type + charset extraction from Content-Type.  Out of scope:
compress/deflate/gzip CONTENT codings (the body is returned as the
transfer layer delivered it — content decoding is the caller's
policy layer), interim 1xx responses, and HTTP/2+ (never appears
inside WARC response records).

Reference parity note: the reference repo (ParquetImporter.php) has
no crawl handling; this module is mandated LLM-pipeline extension
surface (SURVEY.md §2.C pipeline composition).
"""

from __future__ import annotations

_CRLF = b"\r\n"

# RFC grammars for framing tokens (ADVICE r11): int() alone accepts
# Python literal laxities the RFCs reject — a leading '+', a '0x'
# prefix under base 16 (int('0x1f', 16) == 31), '_' digit separators.
# Framing strictness must match the documented contract exactly, so
# tokens are validated against the RFC productions before conversion:
# chunk-size = 1*HEXDIG (RFC 9112 §7.1), Content-Length = 1*DIGIT
# (RFC 9110 §8.6).
_HEXDIG = frozenset(b"0123456789abcdefABCDEF")
_DIGIT = frozenset(b"0123456789")


def _int_token(token: bytes | str, alphabet: frozenset, base: int) -> int:
    raw = token.encode("latin-1") if isinstance(token, str) else token
    if not raw or any(b not in alphabet for b in raw):
        raise ValueError(f"token {raw!r} violates the RFC grammar")
    return int(raw, base)


class HttpFormatError(ValueError):
    """Malformed HTTP response framing; the message names the reason
    for quarantine-bucket grouping."""


def _parse_headers(lines: list[bytes], what: str) -> tuple[dict, int]:
    """Unfold + parse header field lines -> ({lower-name: value},
    field-line count).  Duplicate names combine with ', ' in arrival
    order (RFC 9110 §5.2 list semantics)."""
    unfolded: list[bytes] = []
    for line in lines:
        if line[:1] in (b" ", b"\t"):
            if not unfolded:
                raise HttpFormatError(
                    f"{what}: continuation line before any header field"
                )
            unfolded[-1] += b" " + line.strip()
        else:
            unfolded.append(line)
    fields: dict[str, str] = {}
    for line in unfolded:
        name, sep, value = line.partition(b":")
        if not sep or not name.strip():
            raise HttpFormatError(f"{what}: malformed header line {line!r}")
        key = name.strip().decode("latin-1").lower()
        val = value.strip().decode("latin-1")
        fields[key] = f"{fields[key]}, {val}" if key in fields else val
    return fields, len(unfolded)


def _dechunk(body: bytes) -> bytes:
    """Decode the chunked transfer coding (RFC 9112 §7.1): hex size
    lines (chunk extensions after ';' ignored), exact chunk bytes,
    CRLF after each chunk, last-chunk size 0, then optional trailer
    field lines terminated by an empty line."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise HttpFormatError("chunked body: missing chunk-size line")
        size_token = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = _int_token(size_token, _HEXDIG, 16)
        except ValueError:
            raise HttpFormatError(
                f"chunked body: bad chunk size {size_token!r}"
            )
        pos = eol + 2
        if size == 0:
            break
        if pos + size + 2 > n:
            raise HttpFormatError("chunked body: truncated chunk")
        out += body[pos : pos + size]
        pos += size
        if body[pos : pos + 2] != _CRLF:
            raise HttpFormatError("chunked body: missing CRLF after chunk")
        pos += 2
    # trailer section: zero or more field lines, then an empty line
    while True:
        if body[pos : pos + 2] == _CRLF:
            pos += 2
            break
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise HttpFormatError("chunked body: unterminated trailer")
        pos = eol + 2
    if pos != n:
        raise HttpFormatError("chunked body: trailing bytes after trailer")
    return bytes(out)


def http_parse_response(raw: bytes) -> dict:
    """Parse one raw HTTP response message.

    Returns ``{"version", "status", "reason", "headers", "n_headers",
    "content_type", "charset", "chunked", "body"}`` — headers is a
    dict with lower-cased names, content_type the lower-cased media
    type (parameters stripped) or None, charset the lower-cased
    charset parameter or None."""
    head_end = raw.find(_CRLF + _CRLF)
    if head_end < 0:
        raise HttpFormatError("no CRLF CRLF header terminator")
    head = raw[:head_end]
    body = raw[head_end + 4 :]
    lines = head.split(_CRLF)
    status_line = lines[0]
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/1."):
        raise HttpFormatError(f"bad status line {status_line!r}")
    version = parts[0].decode("latin-1")
    if not (len(parts[1]) == 3 and parts[1].isdigit()):
        raise HttpFormatError(f"bad status code {parts[1]!r}")
    status = int(parts[1])
    reason = parts[2].decode("latin-1") if len(parts) > 2 else ""
    headers, n_headers = _parse_headers(lines[1:], "response")

    te = headers.get("transfer-encoding", "")
    codings = [c.strip().lower() for c in te.split(",") if c.strip()]
    chunked = bool(codings) and codings[-1] == "chunked"
    if codings:
        # RFC 9112 §6.1: chunked must be the FINAL transfer coding,
        # and any additional transfer coding (gzip TE, etc.) would
        # leave transfer-layer bytes in the body — quarantine both
        # rather than silently hand compressed framing downstream
        # (Content-ENCODING is the separate, supported layer).
        if not chunked:
            raise HttpFormatError(
                f"transfer coding list {te!r} does not end in chunked"
            )
        extra = [c for c in codings[:-1] if c != "identity"]
        if extra:
            raise HttpFormatError(
                f"unsupported transfer coding(s) {extra} before chunked"
            )
        body = _dechunk(body)
    elif "content-length" in headers:
        # Duplicate Content-Length field lines were combined with ","
        # by _parse_headers; RFC 9110 §8.6 says differing values make
        # the message invalid — quarantine on disagreement, never
        # accept whichever value the body happens to match (ADVICE
        # r11).  Each value must also be 1*DIGIT exactly.
        cl_values = [
            v.strip() for v in headers["content-length"].split(",")
        ]
        if len(set(cl_values)) > 1:
            raise HttpFormatError(
                f"conflicting Content-Length values "
                f"{headers['content-length']!r}"
            )
        try:
            clen = _int_token(cl_values[0], _DIGIT, 10)
        except ValueError:
            raise HttpFormatError(
                f"bad Content-Length {headers['content-length']!r}"
            )
        if len(body) < clen:
            raise HttpFormatError(
                f"truncated body ({len(body)} < Content-Length {clen})"
            )
        if len(body) > clen:
            raise HttpFormatError(
                f"trailing bytes after Content-Length body "
                f"({len(body)} > {clen})"
            )
        body = body[:clen]
    # else: close-delimited — the rest of the record IS the body

    content_type = None
    charset = None
    if "content-type" in headers:
        ct = headers["content-type"]
        content_type = ct.split(";", 1)[0].strip().lower()
        for param in ct.split(";")[1:]:
            name, sep, value = param.partition("=")
            if sep and name.strip().lower() == "charset":
                charset = value.strip().strip('"').lower()
    return {
        "version": version,
        "status": status,
        "reason": reason,
        "headers": headers,
        "n_headers": n_headers,
        "content_type": content_type,
        "charset": charset,
        "chunked": chunked,
        "body": body,
    }


def http_write_response(
    status: int,
    reason: str,
    headers: list[tuple[str, str]],
    body: bytes,
    chunked: bool = False,
    chunk_size: int = 7,
) -> bytes:
    """Serialize a response in the wire form http_parse_response
    reads — the fixture synthesizer for gate queries and tests.
    ``chunked=True`` emits the chunked transfer coding (chunk
    extension on the first chunk, one trailer field) instead of
    Content-Length, exercising the full de-chunk path."""
    out = bytearray(f"HTTP/1.1 {status} {reason}".encode("latin-1") + _CRLF)
    for name, value in headers:
        out += f"{name}: {value}".encode("latin-1") + _CRLF
    if chunked:
        out += b"Transfer-Encoding: chunked" + _CRLF + _CRLF
        first = True
        for i in range(0, len(body), chunk_size):
            chunk = body[i : i + chunk_size]
            ext = b";x=1" if first else b""
            out += f"{len(chunk):x}".encode() + ext + _CRLF + chunk + _CRLF
            first = False
        out += b"0" + _CRLF + b"X-Trailer: end" + _CRLF + _CRLF
    else:
        out += f"Content-Length: {len(body)}".encode() + _CRLF + _CRLF
        out += body
    return bytes(out)


_IMF_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_IMF_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)
_IMF_RE = None  # compiled lazily


def parse_imf_fixdate(s: str) -> int:
    """Strict RFC 9110 §5.6.7 IMF-fixdate parse -> Unix epoch
    seconds.  The preferred format EXACTLY: ``Tue, 15 Nov 1994
    08:12:31 GMT`` — fixed-width fields, single spaces, 'GMT'
    literal.  The obsolete RFC 850 and asctime() forms, lax
    whitespace, non-GMT zones, out-of-range calendar fields, and a
    day-name that CONTRADICTS the date all raise typed
    :class:`HttpFormatError` (quarantine-on-ambiguity — a recrawl
    scheduler acting on a misparsed date refetches the wrong
    decade)."""
    global _IMF_RE
    if _IMF_RE is None:
        import re

        _IMF_RE = re.compile(
            r"(Mon|Tue|Wed|Thu|Fri|Sat|Sun), "
            r"(\d{2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
            r"(\d{4}) (\d{2}):(\d{2}):(\d{2}) GMT"
        )
    m = _IMF_RE.fullmatch(s)
    if not m:
        raise HttpFormatError(f"not an IMF-fixdate: {s!r}")
    dow, day, mon, year, hh, mi, ss = m.groups()
    import calendar
    import datetime

    day_i, year_i = int(day), int(year)
    mon_i = _IMF_MONTHS.index(mon) + 1
    hh_i, mi_i, ss_i = int(hh), int(mi), int(ss)
    if not (hh_i <= 23 and mi_i <= 59 and ss_i <= 59):
        raise HttpFormatError(f"time of day out of range: {s!r}")
    try:
        d = datetime.date(year_i, mon_i, day_i)
    except ValueError:
        raise HttpFormatError(f"no such calendar date: {s!r}")
    if _IMF_DAYS[d.weekday()] != dow:
        raise HttpFormatError(
            f"day-name {dow} contradicts the date "
            f"({_IMF_DAYS[d.weekday()]}): {s!r}"
        )
    return calendar.timegm((year_i, mon_i, day_i, hh_i, mi_i, ss_i))


def format_imf_fixdate(epoch: int) -> str:
    """Inverse of :func:`parse_imf_fixdate`: Unix epoch seconds ->
    the RFC 9110 preferred IMF-fixdate string (always GMT)."""
    import datetime

    d = datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc)
    return (
        f"{_IMF_DAYS[d.weekday()]}, {d.day:02d} "
        f"{_IMF_MONTHS[d.month - 1]} {d.year:04d} "
        f"{d.hour:02d}:{d.minute:02d}:{d.second:02d} GMT"
    )


def cache_freshness_s(headers: dict, date_epoch: int) -> tuple[int, str]:
    """RFC 9111 §4.2.1-4.2.2 freshness lifetime in seconds ->
    ``(lifetime, source)``: ``Cache-Control: max-age`` wins (token
    validated against 1*DIGIT), else ``Expires - Date``, else the
    §4.2.2 heuristic — 10% of (Date - Last-Modified), integer floor
    — else 0 with source 'none'.  Negative Expires deltas clamp to 0
    (already stale), matching the RFC's 'in the past means expired'
    rule."""
    cc = headers.get("cache-control", "")
    for directive in cc.split(","):
        name, sep, value = directive.strip().partition("=")
        if name.strip().lower() == "max-age" and sep:
            try:
                return _int_token(value.strip(), _DIGIT, 10), "max-age"
            except ValueError:
                raise HttpFormatError(f"bad max-age {value!r}")
    if "expires" in headers:
        exp = parse_imf_fixdate(headers["expires"])
        return max(exp - date_epoch, 0), "expires"
    if "last-modified" in headers:
        lm = parse_imf_fixdate(headers["last-modified"])
        if lm > date_epoch:
            raise HttpFormatError(
                "Last-Modified after Date (clock skew) — quarantine"
            )
        return (date_epoch - lm) // 10, "heuristic"
    return 0, "none"


def parse_retry_after(value: str, date_epoch: int) -> int:
    """RFC 9110 §10.2.3 ``Retry-After`` -> the absolute epoch second
    of the next permitted attempt.  The field is either
    delta-seconds (1*DIGIT, relative to the response ``Date``) or an
    HTTP-date (strict IMF-fixdate); anything else — including the
    int() laxities the 1*DIGIT grammar rejects — raises typed
    :class:`HttpFormatError`.  A past HTTP-date clamps to
    ``date_epoch`` (retry immediately), mirroring the freshness
    clamp."""
    v = value.strip()
    try:
        return date_epoch + _int_token(v, _DIGIT, 10)
    except ValueError:
        pass
    return max(parse_imf_fixdate(v), date_epoch)


_META_CHARSET = None  # compiled lazily below


def sniff_charset(
    header_charset: str | None, body: bytes
) -> tuple[str, str, int]:
    """Detect a document's character encoding the way browsers and
    crawl pipelines do (a documented simplification of the WHATWG
    encoding sniffing algorithm) -> ``(charset, source, bom_len)``
    where source names the winning evidence tier and bom_len is the
    byte-order-mark prefix to strip before decoding:

    1. ``bom`` — a UTF-8 / UTF-16LE / UTF-16BE byte-order mark wins
       over everything (WHATWG: the BOM is authoritative);
    2. ``header`` — the transport-declared charset
       (Content-Type's parameter, as http_parse_response extracts);
    3. ``meta`` — an ASCII-case-insensitive ``<meta charset=...>`` or
       ``<meta http-equiv=Content-Type content="...charset=...">``
       within the first 1024 bytes (the WHATWG prescan window);
    4. ``default`` — utf-8 (this pipeline's documented default for
       undeclared web text; WHATWG's locale-dependent windows-1252
       legacy default is a browser-compat concern, not a corpus one).

    Charsets are reported lower-case; no decoding is attempted here
    (the caller owns decode policy and its quarantine)."""
    global _META_CHARSET
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", "bom", 3
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", "bom", 2
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", "bom", 2
    if header_charset:
        return header_charset.lower(), "header", 0
    if _META_CHARSET is None:
        import re

        _META_CHARSET = re.compile(
            r"""<meta\s+(?:[^>]*?\s)?charset\s*=\s*["']?\s*([a-zA-Z0-9._-]+)"""
            r"""|<meta\s+[^>]*?http-equiv\s*=\s*["']?content-type["']?"""
            r"""[^>]*?charset\s*=\s*["']?\s*([a-zA-Z0-9._-]+)""",
            re.IGNORECASE,
        )
    head = body[:1024].decode("latin-1", "replace")
    m = _META_CHARSET.search(head)
    if m:
        return (m.group(1) or m.group(2)).lower(), "meta", 0
    return "utf-8", "default", 0


def http_decode_content(headers: dict, body: bytes) -> tuple[bytes, str]:
    """Apply the Content-Encoding CONTENT coding(s) (RFC 9110 §8.4.1)
    to a framed body -> ``(decoded_body, label)`` where label is the
    normalized coding list that was applied (``identity`` when none).
    Codings apply right-to-left per the RFC's list semantics.

    Supported: ``gzip``/``x-gzip`` (single member, strict trailer —
    trailing bytes after the member raise), ``deflate`` both as the
    RFC's zlib-wrapped form and the bare-DEFLATE form widespread
    misconfigured servers emit (tried second, the standard tolerance),
    ``identity``.  ``br``/``zstd``/``compress`` and anything unknown
    raise typed :class:`HttpFormatError` — a pipeline quarantines
    those, it never ships garbled bytes to text extraction."""
    import zlib

    ce = headers.get("content-encoding", "")
    codings = [c.strip().lower() for c in ce.split(",") if c.strip()]
    if not codings:
        return body, "identity"
    for coding in reversed(codings):
        if coding == "identity":
            continue
        if coding in ("gzip", "x-gzip"):
            d = zlib.decompressobj(16 + 15)
            try:
                out = d.decompress(body)
            except zlib.error as exc:
                raise HttpFormatError(f"bad gzip content coding: {exc}")
            if not d.eof:
                raise HttpFormatError("truncated gzip content coding")
            if d.unused_data:
                raise HttpFormatError(
                    "trailing bytes after gzip content coding"
                )
            body = out
        elif coding == "deflate":
            for wbits in (15, -15):  # zlib-wrapped, then raw (tolerance)
                d = zlib.decompressobj(wbits)
                try:
                    out = d.decompress(body)
                except zlib.error:
                    continue
                if d.eof and not d.unused_data:
                    body = out
                    break
            else:
                raise HttpFormatError("bad deflate content coding")
        else:
            raise HttpFormatError(
                f"unsupported content coding {coding!r} (quarantine)"
            )
    return body, ",".join(codings)

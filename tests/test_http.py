"""HTTP/1.x response parser (operators/http.py): wire round-trips in
both framings, header semantics (case, folding, duplicates), charset
extraction, and typed quarantine for every malformed-framing class."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_sql_spark.operators.http import (
    HttpFormatError,
    http_parse_response,
    http_write_response,
)


@settings(max_examples=25, deadline=None)
@given(
    blen=st.integers(0, 200),
    seed=st.integers(0, 1000),
    chunked=st.booleans(),
    chunk_size=st.integers(1, 40),
)
def test_roundtrip_both_framings(blen, seed, chunked, chunk_size):
    body = bytes((seed + 3 * i) % 256 for i in range(blen))
    raw = http_write_response(
        200, "OK",
        [("Content-Type", "text/html; charset=UTF-8"), ("Server", "s")],
        body, chunked=chunked, chunk_size=chunk_size,
    )
    out = http_parse_response(raw)
    assert out["status"] == 200 and out["reason"] == "OK"
    assert out["body"] == body
    assert out["chunked"] is chunked
    assert out["content_type"] == "text/html"
    assert out["charset"] == "utf-8"


def test_header_semantics_fold_case_duplicates():
    raw = (
        b"HTTP/1.1 301 Moved Permanently\r\n"
        b"LOCATION: http://a/\r\n"
        b"X-Long: first part\r\n"
        b"  continued here\r\n"
        b"\tand again\r\n"
        b"Via: a\r\n"
        b"via: b\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n"
    )
    out = http_parse_response(raw)
    assert out["status"] == 301
    assert out["reason"] == "Moved Permanently"
    assert out["headers"]["location"] == "http://a/"
    assert out["headers"]["x-long"] == "first part continued here and again"
    assert out["headers"]["via"] == "a, b"  # RFC 9110 list combining
    assert out["n_headers"] == 5
    assert out["body"] == b""


def test_close_delimited_body_and_quoted_charset():
    raw = (
        b"HTTP/1.0 200 OK\r\n"
        b'Content-Type: Text/HTML; charset="ISO-8859-1"\r\n'
        b"\r\n"
        b"tail bytes are the body"
    )
    out = http_parse_response(raw)
    assert out["version"] == "HTTP/1.0"
    assert out["body"] == b"tail bytes are the body"
    assert out["content_type"] == "text/html"
    assert out["charset"] == "iso-8859-1"
    assert out["chunked"] is False


def test_chunked_extensions_and_trailers_decode():
    raw = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        b"4;name=val\r\nWiki\r\n"
        b"5\r\npedia\r\n"
        b"0\r\n"
        b"X-Checksum: abc\r\n"
        b"\r\n"
    )
    assert http_parse_response(raw)["body"] == b"Wikipedia"


def test_quarantine_errors_are_typed():
    ok_body = b"abcdef"
    base = http_write_response(200, "OK", [("A", "b")], ok_body)
    chunked = http_write_response(200, "OK", [], ok_body, chunked=True,
                                  chunk_size=4)
    cases = [
        (b"", "no CRLF CRLF"),
        (b"ICY 200 OK\r\n\r\n", "bad status line"),
        (b"HTTP/1.1 20 OK\r\n\r\n", "bad status code"),
        (b"HTTP/1.1 200 OK\r\nNoColonHere\r\n\r\n", "malformed header"),
        (b"HTTP/1.1 200 OK\r\n  orphan\r\n\r\n", "continuation line"),
        (b"HTTP/1.1 200 OK\r\nContent-Length: x\r\n\r\n",
         "bad Content-Length"),
        (b"HTTP/1.1 200 OK\r\nContent-Length: 10\r\n\r\nshort",
         "truncated body"),
        (b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nlonger",
         "trailing bytes"),
        (base.replace(b"Content-Length: 6", b"Content-Length: -1"),
         "bad Content-Length"),  # '-' violates 1*DIGIT (was a special
        # negative check before the r11 ADVICE grammar tightening)
        (chunked.replace(b"4;x=1", b"g"), "bad chunk size"),
        (chunked[:-12], "truncated|unterminated|missing"),
        (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
         b"2\r\nabX\r\n0\r\n\r\n", "missing CRLF after chunk"),
        (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
         b"1\r\na\r\n0\r\n\r\nextra", "trailing bytes after trailer"),
    ]
    for bad, why in cases:
        with pytest.raises(HttpFormatError, match=why):
            http_parse_response(bad)


def test_framing_token_grammar_is_rfc_strict():
    """ADVICE r11: int() accepts a leading '+', a '0x' prefix under
    base 16, and '_' digit separators — all outside the RFC
    productions (chunk-size = 1*HEXDIG, Content-Length = 1*DIGIT).
    Each laxity must quarantine, not parse."""
    def cl(value: bytes) -> bytes:
        return (b"HTTP/1.1 200 OK\r\nContent-Length: " + value
                + b"\r\n\r\n" + b"x" * 31)

    for bad in (b"+31", b"3_1", b"0x1f", b" "):
        with pytest.raises(HttpFormatError, match="bad Content-Length"):
            http_parse_response(cl(bad))
    # the exact-match body guard still applies to the valid form
    assert http_parse_response(cl(b"31"))["body"] == b"x" * 31

    def chunk(size_token: bytes) -> bytes:
        return (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                + size_token + b"\r\n" + b"y" * 31 + b"\r\n0\r\n\r\n")

    # int('0x1f', 16) == 31 and int('1_f', 16) == 31: both would
    # frame this body "correctly" — the grammar must still reject
    for bad in (b"0x1f", b"1_f", b"+1f", b""):
        with pytest.raises(HttpFormatError, match="bad chunk size"):
            http_parse_response(chunk(bad))
    assert http_parse_response(chunk(b"1f"))["body"] == b"y" * 31
    assert http_parse_response(chunk(b"1F"))["body"] == b"y" * 31


def test_duplicate_content_length_must_agree():
    """ADVICE r11 / RFC 9110 §8.6: duplicate Content-Length field
    lines with differing values make the message invalid — quarantine
    even when the body happens to match the first value.  Identical
    duplicates (the RFC's explicitly tolerated case) still parse."""
    conflicting = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Length: 4\r\n"
        b"Content-Length: 7\r\n"
        b"\r\n"
        b"body"  # matches the FIRST value — must still quarantine
    )
    with pytest.raises(HttpFormatError, match="conflicting Content-Length"):
        http_parse_response(conflicting)
    agreeing = conflicting.replace(b"Content-Length: 7", b"Content-Length: 4")
    assert http_parse_response(agreeing)["body"] == b"body"
    # combined-on-one-line form (already list-valued on arrival)
    single = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 4, 5\r\n\r\nbody"
    )
    with pytest.raises(HttpFormatError, match="conflicting Content-Length"):
        http_parse_response(single)


def test_sniff_charset_precedence_and_bom_strip():
    from parquet_to_sql_spark.operators.http import sniff_charset

    # BOM beats a conflicting header AND meta
    body16 = b"\xff\xfe" + "hi".encode("utf-16-le")
    assert sniff_charset("utf-8", body16) == ("utf-16-le", "bom", 2)
    assert sniff_charset(None, b"\xef\xbb\xbfx") == ("utf-8", "bom", 3)
    assert sniff_charset(None, b"\xfe\xffx") == ("utf-16-be", "bom", 2)
    # header beats meta
    meta = b'<html><meta charset="UTF-8"><body>'
    assert sniff_charset("ISO-8859-1", meta) == ("iso-8859-1", "header", 0)
    # meta variants, ASCII-case-insensitive, inside the 1024-byte window
    assert sniff_charset(None, meta) == ("utf-8", "meta", 0)
    httpequiv = (
        b"<META HTTP-EQUIV='Content-Type' "
        b"CONTENT='text/html; charset=Windows-1252'>"
    )
    assert sniff_charset(None, httpequiv) == ("windows-1252", "meta", 0)
    # meta OUTSIDE the 1024-byte prescan window is ignored
    far = b" " * 1024 + b'<meta charset="koi8-r">'
    assert sniff_charset(None, far) == ("utf-8", "default", 0)
    # nothing declared -> documented utf-8 default
    assert sniff_charset(None, b"<html>plain") == ("utf-8", "default", 0)


def test_content_codings_decode_and_quarantine():
    import zlib

    from parquet_to_sql_spark.operators.http import http_decode_content

    body = bytes(range(200)) * 3
    gz = zlib.compress(body, 6)
    # zlib.compress is the zlib-wrapped (RFC-correct deflate) form
    assert http_decode_content({"content-encoding": "deflate"}, gz) == (
        body, "deflate",
    )
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    rawb = raw.compress(body) + raw.flush()
    assert http_decode_content({"content-encoding": "deflate"}, rawb) == (
        body, "deflate",
    )
    gzo = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
    gzb = gzo.compress(body) + gzo.flush()
    for label in ("gzip", "X-Gzip", " gzip "):
        assert http_decode_content(
            {"content-encoding": label}, gzb
        )[0] == body
    # right-to-left list semantics: 'identity, gzip' = gzip applied
    assert http_decode_content(
        {"content-encoding": "identity, gzip"}, gzb
    )[0] == body
    assert http_decode_content({}, body) == (body, "identity")
    import pytest as _pytest

    from parquet_to_sql_spark.operators.http import HttpFormatError

    with _pytest.raises(HttpFormatError, match="unsupported content coding"):
        http_decode_content({"content-encoding": "br"}, body)
    with _pytest.raises(HttpFormatError, match="truncated gzip"):
        http_decode_content({"content-encoding": "gzip"}, gzb[:-5])
    with _pytest.raises(HttpFormatError, match="trailing bytes"):
        http_decode_content({"content-encoding": "gzip"}, gzb + b"xx")
    with _pytest.raises(HttpFormatError, match="bad deflate"):
        http_decode_content({"content-encoding": "deflate"}, b"\x00garbage")


def test_transfer_coding_list_semantics():
    """RFC 9112 §6.1: chunked must be the FINAL transfer coding; a
    gzip TRANSFER coding (distinct from Content-Encoding) is out of
    scope and must quarantine, never pass compressed framing bytes
    downstream as the body."""
    ok = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: identity, chunked\r\n"
        b"\r\n"
        b"2\r\nab\r\n0\r\n\r\n"
    )
    assert http_parse_response(ok)["body"] == b"ab"
    with pytest.raises(HttpFormatError, match="does not end in chunked"):
        http_parse_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nxx"
        )
    with pytest.raises(HttpFormatError, match="unsupported transfer"):
        http_parse_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
            b"2\r\nab\r\n0\r\n\r\n"
        )


def test_imf_fixdate_roundtrip_and_strictness():
    """RFC 9110 §5.6.7: the preferred IMF-fixdate form round-trips
    epoch-exactly; obsolete forms, lax spacing, non-GMT zones,
    impossible dates, and day-names contradicting the date all
    quarantine."""
    from parquet_to_sql_spark.operators.http import (
        format_imf_fixdate,
        parse_imf_fixdate,
    )

    assert parse_imf_fixdate("Tue, 15 Nov 1994 08:12:31 GMT") == 784887151
    assert format_imf_fixdate(784887151) == "Tue, 15 Nov 1994 08:12:31 GMT"
    for epoch in (0, 1700000000, 784887151, 2**31 - 1, 951782400):
        assert parse_imf_fixdate(format_imf_fixdate(epoch)) == epoch

    bad = [
        "Tuesday, 15-Nov-94 08:12:31 GMT",     # RFC 850 form
        "Tue Nov 15 08:12:31 1994",            # asctime form
        "Tue, 15 Nov 1994 08:12:31 UT",        # non-GMT zone
        "Tue,  15 Nov 1994 08:12:31 GMT",      # double space
        "Tue, 15 Nov 1994 08:12:61 GMT",       # bad seconds
        "Wed, 31 Feb 1994 08:12:31 GMT",       # impossible date
        "tue, 15 Nov 1994 08:12:31 GMT",       # case matters
    ]
    for s in bad:
        with pytest.raises(HttpFormatError, match="IMF-fixdate|range|date"):
            parse_imf_fixdate(s)
    # correct format, WRONG weekday (15 Nov 1994 was a Tuesday)
    with pytest.raises(HttpFormatError, match="contradicts"):
        parse_imf_fixdate("Mon, 15 Nov 1994 08:12:31 GMT")


def test_cache_freshness_precedence_and_heuristic():
    """RFC 9111: max-age beats Expires beats the 10% heuristic;
    past Expires clamps to 0; max-age value follows the 1*DIGIT
    grammar; Last-Modified after Date quarantines."""
    from parquet_to_sql_spark.operators.http import (
        cache_freshness_s,
        format_imf_fixdate,
    )

    d0 = 1700000000
    date_s = format_imf_fixdate(d0)
    lm_s = format_imf_fixdate(d0 - 86400 * 20)  # age 20 days
    exp_s = format_imf_fixdate(d0 + 777)

    assert cache_freshness_s(
        {"cache-control": "public, max-age=300", "expires": exp_s,
         "last-modified": lm_s}, d0,
    ) == (300, "max-age")
    assert cache_freshness_s(
        {"expires": exp_s, "last-modified": lm_s}, d0
    ) == (777, "expires")
    assert cache_freshness_s({"last-modified": lm_s}, d0) == (
        86400 * 2, "heuristic",
    )
    assert cache_freshness_s({}, d0) == (0, "none")
    # past Expires -> already stale, clamp to 0
    assert cache_freshness_s(
        {"expires": format_imf_fixdate(d0 - 5)}, d0
    ) == (0, "expires")
    with pytest.raises(HttpFormatError, match="bad max-age"):
        cache_freshness_s({"cache-control": "max-age=+30"}, d0)
    with pytest.raises(HttpFormatError, match="clock skew"):
        cache_freshness_s(
            {"last-modified": format_imf_fixdate(d0 + 10)}, d0
        )


def test_retry_after_both_forms_and_strictness():
    """RFC 9110 §10.2.3: delta-seconds (1*DIGIT, relative to Date)
    vs HTTP-date (strict IMF-fixdate); past dates clamp to Date;
    grammar laxities quarantine."""
    from parquet_to_sql_spark.operators.http import (
        format_imf_fixdate,
        parse_retry_after,
    )

    d0 = 1690000000
    assert parse_retry_after("120", d0) == d0 + 120
    assert parse_retry_after(" 0 ", d0) == d0
    assert parse_retry_after(format_imf_fixdate(d0 + 333), d0) == d0 + 333
    assert parse_retry_after(format_imf_fixdate(d0 - 50), d0) == d0
    for bad in ("+120", "1_0", "0x10", "tomorrow", ""):
        with pytest.raises(HttpFormatError):
            parse_retry_after(bad, d0)

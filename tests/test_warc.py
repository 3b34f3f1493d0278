"""WARC reader/writer (operators/warc.py): framing round-trips in
both wire forms, header fidelity, and typed quarantine for every
malformed-framing class."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_to_sql_spark.operators.warc import (
    WarcFormatError,
    warc_gzip_members,
    warc_records,
    warc_write_record,
)


def _recs(n: int, seed: int = 0) -> list[bytes]:
    return [
        warc_write_record(
            ["response", "request", "metadata"][i % 3],
            f"http://ex.com/{seed}/{i}",
            bytes((seed + i * 7 + j) % 256 for j in range(i * 13 % 40)),
            f"id-{seed}-{i}",
        )
        for i in range(n)
    ]


@settings(max_examples=20, deadline=None)
@given(n=st.integers(1, 8), seed=st.integers(0, 1000))
def test_roundtrip_both_wire_forms(n, seed):
    recs = _recs(n, seed)
    plain = warc_records(b"".join(recs))
    gz = warc_records(warc_gzip_members(recs))
    assert plain == gz
    assert len(plain) == n
    for i, r in enumerate(plain):
        assert r["uri"] == f"http://ex.com/{seed}/{i}"
        assert r["record_id"] == f"<urn:uuid:id-{seed}-{i}>"
        assert len(r["content"]) == i * 13 % 40


def test_content_may_contain_crlf_and_warc_magic():
    """Content-Length framing means the block can contain anything —
    including CRLF CRLF and 'WARC/' — without splitting the record."""
    evil = b"WARC/1.0\r\n\r\nnot a real record\r\n\r\n"
    rec = warc_write_record("resource", "http://e/x", evil, "e1")
    out = warc_records(rec)
    assert len(out) == 1 and out[0]["content"] == evil


def test_folded_header_lines_unfold_per_iso28500():
    """ADVICE r10: the ISO 28500 grammar permits a header VALUE to
    wrap onto following lines that begin with SP/HTAB — the reader
    must join them onto the preceding field, not quarantine the
    record.  A continuation before any field is still malformed."""
    body = b"hello"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Target-URI: http://example.com/a-very\r\n"
        b"  -long-path/continued\r\n"
        b"\tagain\r\n"
        b"WARC-Record-ID: <urn:uuid:f1>\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
        b"\r\n" + body + b"\r\n\r\n"
    )
    out = warc_records(rec)
    assert len(out) == 1
    assert out[0]["uri"] == "http://example.com/a-very -long-path/continued again"
    assert out[0]["content"] == body
    # a continuation line with no preceding field is a framing error
    bad = (
        b"WARC/1.0\r\n"
        b"  orphan continuation\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n\r\n\r\n"
    )
    with pytest.raises(WarcFormatError, match="continuation"):
        warc_records(bad)


def test_quarantine_errors_are_typed():
    recs = _recs(2, 5)
    plain = b"".join(recs)
    gz = warc_gzip_members(recs)
    cases = [
        (b"", "empty"),
        (b"HTTP/1.1 200 OK\r\n\r\n", "bad version line"),
        (plain[:-6], "terminator|truncated"),
        (plain[: len(recs[0]) + 30], "unterminated|truncated"),
        (gz[:-4], "gzip"),
        (b"\x1f\x8b" + b"junkjunk", "gzip"),
        (plain.replace(b"WARC/1.0", b"WARC/0.9", 1), "unsupported version"),
        (
            plain.replace(b"Content-Length: ", b"Content-Foo: ", 2),
            "missing Content-Length",
        ),
    ]
    for bad, why in cases:
        with pytest.raises(WarcFormatError, match=why):
            warc_records(bad)


def test_file_level_ingestion_equals_payload_column_path(spark):
    """VERDICT r10 'What's missing' #2: the binaryFile -> gzip-member
    -> warc_records FILE path must agree with the payload-column gate
    on identical records — same doc set, same record counts, same
    response bodies (value-exact on the shared columns)."""
    from parquet_to_sql_spark.queries.registry import all_queries

    sf = "/root/testdata/sf0.01"
    qs = all_queries()
    shared = ["doc_id", "n_records", "response_len", "body_sum",
              "types_sorted"]
    file_rows = sorted(
        tuple(r) for r in qs["source_warc_files"]
        .build(spark, sf).select(*shared).collect()
    )
    col_rows = sorted(
        tuple(r) for r in qs["source_warc_records"]
        .build(spark, sf).select(*shared).collect()
    )
    assert file_rows == col_rows
    assert len(file_rows) == 500


def test_redirect_files_chase_parses_all_location_forms(spark):
    """The shared crawl fixture rotates Location forms by doc_id%3
    (absolute, root-relative, protocol-relative); the chase gate's
    edge extraction must resolve ALL of them to the same arithmetic
    targets — and a 301 record whose Location header is missing must
    quarantine with the typed WARC error, not emit a guessed edge."""
    import pytest

    from parquet_to_sql_spark.queries.pipelines import (
        _crawl_files_fixture,
        _redirect_target,
    )

    sf = "/root/testdata/sf0.01"
    dest = _crawl_files_fixture(spark, sf)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(dest)
    )

    # re-extract edges exactly the gate does, then compare against
    # the fixture formula for every Location form class
    from parquet_to_sql_spark.queries.registry import all_queries

    q = all_queries()["pipeline_redirect_files_chase"]
    # the gate output is hash-checked elsewhere; here check the raw
    # edge layer: parse via the same operators inline
    from parquet_to_sql_spark.operators.http import http_parse_response
    from parquet_to_sql_spark.operators.warc import warc_records

    n = 500
    seen = {}
    for row in files.select("content").collect():
        for rec in warc_records(bytes(row.content)):
            if rec["warc_type"] != "response":
                continue
            resp = http_parse_response(rec["content"])
            if resp["status"] != 301:
                continue
            did = int(rec["uri"].rsplit("/", 1)[1])
            seen[did] = resp["headers"]["location"]
    assert seen, "fixture must contain 301 responses"
    forms = {did % 3 for did in seen}
    assert forms == {0, 1, 2}, "all three Location forms must occur"
    for did, loc in seen.items():
        t = _redirect_target(did, n)
        assert str(t) == loc.rsplit("/", 1)[1], (did, loc, t)

    # missing Location quarantines through the Spark job
    from parquet_to_sql_spark.operators.http import http_write_response
    from parquet_to_sql_spark.operators.warc import (
        warc_gzip_members,
        warc_write_record,
    )
    import tempfile
    import os

    bad_dir = tempfile.mkdtemp(prefix="bad_redirect_")
    msg = http_write_response(301, "Moved Permanently", [], b"x")
    with open(os.path.join(bad_dir, "shard-0.warc.gz"), "wb") as f:
        f.write(warc_gzip_members(
            [warc_write_record("response", "http://ex.com/5", msg, "r5")]
        ))
    bad_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(bad_dir)
    )
    import parquet_to_sql_spark.queries.pipelines as P

    # drive just the edge-extraction stage over the bad shard by
    # rebuilding the gate against a patched fixture dir
    def build_bad():
        orig = P._crawl_files_fixture
        P._crawl_files_fixture = lambda s, d: bad_dir
        try:
            return q.build(spark, sf).collect()
        finally:
            P._crawl_files_fixture = orig

    # Spark surfaces Python-worker errors as PythonException OR
    # Py4JJavaError depending on which layer reports first — match
    # the typed message, not the wrapper (repo precedent: the
    # corrupt-member test above)
    with pytest.raises(Exception, match="301 without Location"):
        build_bad()


def test_fixture_cache_key_tracks_recipe_source():
    """ADVICE r11: the shard-fixture cache key must change when the
    synthesis code changes — a hardcoded version token silently
    reuses stale /tmp files after a recipe edit.  The key is now a
    hash of the recipe functions' SOURCE: same functions -> same dir,
    any function body change -> different dir; doc count and sf name
    still key independently."""
    from parquet_to_sql_spark.queries.fixtures import fixture_cache_dir

    def recipe_a():
        return 1

    def recipe_b():
        return 2

    root, d1 = fixture_cache_dir("k", "/root/testdata/sf0.01", 500, recipe_a)
    _, d1_again = fixture_cache_dir(
        "k", "/root/testdata/sf0.01", 500, recipe_a
    )
    _, d2 = fixture_cache_dir("k", "/root/testdata/sf0.01", 500, recipe_b)
    _, d3 = fixture_cache_dir("k", "/root/testdata/sf0.01", 501, recipe_a)
    _, d4 = fixture_cache_dir("k", "/root/testdata/sf0.1", 500, recipe_a)
    assert d1 == d1_again
    assert len({d1, d2, d3, d4}) == 4
    assert all(p.startswith(root + "/") for p in (d1, d2, d3, d4))
    assert "sf0.01-n500-" in d1

    # the two production fixtures key off their real recipe functions
    # (the query build fn + every byte-shaping writer it calls)
    from parquet_to_sql_spark.operators.warc import (
        warc_gzip_members,
        warc_write_record,
    )
    from parquet_to_sql_spark.queries.importing import source_warc_files
    from parquet_to_sql_spark.queries.registry import all_queries

    _ = all_queries()  # ensure registration side effects ran
    _, dest = fixture_cache_dir(
        "spark_graft_warc_files", "/root/testdata/sf0.01", 500,
        source_warc_files, warc_write_record, warc_gzip_members,
    )
    assert "/spark_graft_warc_files/sf0.01-n500-" in dest


def test_file_level_ingestion_quarantines_corrupt_member(spark, tmp_path):
    """A shard whose gzip member is truncated mid-stream must surface
    the TYPED WarcFormatError through the Spark job — quarantine,
    never silent partial output."""
    from parquet_to_sql_spark.operators.warc import (
        warc_gzip_members,
        warc_write_record,
    )

    good = warc_gzip_members(
        [warc_write_record("response", "http://ex.com/1", b"abc", "q1")]
    )
    (tmp_path / "shard-0.warc.gz").write_bytes(good[: len(good) - 7])
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(str(tmp_path))
    )

    def parse(batches):
        import pandas as pd

        from parquet_to_sql_spark.operators.warc import warc_records

        for pdf in batches:
            n = sum(len(warc_records(bytes(c))) for c in pdf["content"])
            yield pd.DataFrame({"n": [n]})

    with pytest.raises(Exception, match="WarcFormatError|truncated gzip"):
        df.select("content").mapInPandas(parse, "n long").collect()

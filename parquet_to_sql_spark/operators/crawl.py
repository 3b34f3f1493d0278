"""Composed crawl-ingest stage: WARC parse -> HTML extract -> screen.

One Arrow-batched mapInPandas pass from crawl bytes to a keep/drop
verdict, shared verbatim by the batch gate query
(pipeline_crawl_ingest_e2e) and the streaming at-ingest twin
(streaming.pipeline.crawl_ingest_stream) — stateless, so batch and
stream outputs are bit-identical on the same rows (the established
screen-stream contract: same operator function, no state store).

The synthesis step (deterministic WARC+HTML from doc_id) stands in
for a binaryFile scan of .warc.gz shards; the parse/extract path is
byte-identical either way.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

INGEST_SCHEMA = (
    "doc_id long, url string, gzipped boolean, title string, "
    "n_words long, n_links long, keep boolean"
)


def synth_doc_html(did: int) -> str:
    """Deterministic HTML for a doc id — the construction
    pipeline_html_extract pins (a title, a script whose contents must
    NOT leak into text, did%4 nav links, 1 + did%5 paragraphs of
    arithmetic word counts).  Shared by the payload-column ingest
    below and the FILE-level chain (pipeline_crawl_ingest_files)."""
    nlinks = did % 4
    nparas = 1 + did % 5
    nav = "".join(f'<a href="/l{k}">nav</a> ' for k in range(nlinks))
    paras = "".join(
        "<p>" + " ".join(f"w{p}" for _ in range(3 + (did + p) % 4)) + "</p>"
        for p in range(nparas)
    )
    return (
        f"<html><head><title> Doc  {did} </title>"
        f'<script>var j = "z9 z9 z9";</script></head>'
        f"<body><nav>{nav}</nav>{paras}</body></html>"
    )


def synth_crawl_payload(did: int) -> tuple[bytes, bool]:
    """Deterministic (warc_payload, gzipped) for a doc id: a request
    record plus a response record whose block is the same HTML
    construction pipeline_html_extract pins; every third doc in the
    gzip-member wire form."""
    from parquet_to_sql_spark.operators.warc import (
        warc_gzip_members,
        warc_write_record,
    )

    html = synth_doc_html(did)
    url = f"http://ex.com/{did}"
    recs = [
        warc_write_record("request", url, b"GET /", f"q{did}"),
        warc_write_record("response", url, html.encode("utf-8"), f"r{did}"),
    ]
    gz = did % 3 == 0
    return (warc_gzip_members(recs) if gz else b"".join(recs)), gz


def ingest_warc_docs(df: DataFrame, min_words: int = 8) -> DataFrame:
    """Run the composed ingest over a (batch or streaming) DataFrame
    with a ``doc_id`` column: synthesize the WARC payload, parse it
    (operators/warc.py), extract the response's visible text
    (operators/html.py), apply the word-count admission screen."""
    import pandas as pd

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parquet_to_sql_spark.operators.html import html_extract
        from parquet_to_sql_spark.operators.warc import warc_records

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload, gz = synth_crawl_payload(did)
                parsed = warc_records(payload)
                resp = next(
                    r for r in parsed if r["warc_type"] == "response"
                )
                out = html_extract(resp["content"])
                words = out["text"].split(" ") if out["text"] else []
                rows.append(
                    (
                        did,
                        resp["uri"],
                        gz,
                        out["title"],
                        len(words),
                        len(out["links"]),
                        len(words) >= min_words,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "url", "gzipped", "title",
                    "n_words", "n_links", "keep",
                ],
            )

    return df.select("doc_id").mapInPandas(ingest, schema=INGEST_SCHEMA)

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


def synth_chrome_page(did: int) -> str:
    """Deterministic FULL-CHROME page for a doc id — the construction
    pipeline_main_content_extract pins: a header, a nav of 2+did%3
    one-word links, an aside (every fourth doc), 1+did%5 article
    paragraphs with arithmetic word counts (paragraph 0 of even docs
    embeds one inline link — low link density, must stay main), a
    related-posts row (all links — majority-linked boilerplate), a
    two-word call-to-action with a link (short-link boilerplate),
    and a footer with links.  Every boilerplate family the
    html_main_content rules classify occurs on every page."""
    k = 2 + did % 3
    nav = " ".join(f'<a href="/n{j}">nav{j}</a>' for j in range(k))
    aside = (
        '<aside>sponsored offer <a href="/deal">deal</a> today</aside>'
        if did % 4 == 0 else ""
    )
    paras = []
    for p in range(1 + did % 5):
        words = " ".join(f"w{p}" for _ in range(3 + (did + p) % 4))
        if p == 0 and did % 2 == 0:
            words += ' <a href="/m">more</a>'
        paras.append(f"<p>{words}</p>")
    related = (
        '<div><a href="/r1">rel1</a> <a href="/r2">rel2</a> '
        '<a href="/r3">rel3</a></div>'
    )
    promo = '<p><a href="/sub">Subscribe</a> now</p>'
    footer = (
        '<footer>Copyright ex com <a href="/t">terms</a> '
        '<a href="/p">privacy</a></footer>'
    )
    return (
        f"<html><head><title>Doc {did}</title></head><body>"
        f"<header>Site Header</header><nav>{nav}</nav>{aside}"
        f"{''.join(paras)}{related}{promo}{footer}</body></html>"
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


FILES_INGEST_SCHEMA = (
    "doc_id long, shard long, status int, charset string, "
    "chunked boolean, title string, n_words long, n_links long, "
    "keep boolean"
)


def ingest_warc_shard_files(files: DataFrame, min_words: int = 8) -> DataFrame:
    """Parse binaryFile rows of ``shard-N.warc.gz`` files through the
    FULL crawl front half — gzip member walk + ISO 28500 WARC framing
    (operators/warc.py), raw HTTP/1.1 response parse with chunked /
    Content-Length framing and charset extraction (operators/http.py),
    HTML visible-text extraction (operators/html.py), and the
    status + word-count admission screen — in ONE Arrow-batched
    mapInPandas stage.  Shared verbatim by the batch gate query
    (pipeline_crawl_ingest_files) and the streaming file-source twin
    (streaming.pipeline.crawl_files_stream): stateless, so batch and
    stream outputs are bit-identical on the same shard files.

    ``files`` must carry binaryFile's (path, content) columns; every
    record URI must be the fixture's ``http://ex.com/<doc_id>`` form
    (anything else is a typed WarcFormatError — quarantine, never a
    guess)."""
    import pandas as pd

    def ingest_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        from parquet_to_sql_spark.operators.html import html_extract
        from parquet_to_sql_spark.operators.http import http_parse_response
        from parquet_to_sql_spark.operators.warc import (
            WarcFormatError,
            warc_records,
        )

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.warc\.gz$", path)
                if not m:
                    raise WarcFormatError(f"unexpected shard file {path!r}")
                shard = int(m.group(1))
                for rec in warc_records(bytes(content)):
                    if rec["warc_type"] != "response":
                        continue
                    um = re.fullmatch(r"http://ex\.com/(\d+)", rec["uri"])
                    if not um:
                        raise WarcFormatError(
                            f"unexpected record uri {rec['uri']!r}"
                        )
                    did = int(um.group(1))
                    resp = http_parse_response(rec["content"])
                    text = resp["body"].decode(resp["charset"] or "utf-8")
                    out = html_extract(text)
                    words = out["text"].split(" ") if out["text"] else []
                    rows.append(
                        (
                            did, shard, resp["status"], resp["charset"],
                            resp["chunked"], out["title"], len(words),
                            len(out["links"]),
                            resp["status"] == 200 and len(words) >= min_words,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "shard", "status", "charset", "chunked",
                    "title", "n_words", "n_links", "keep",
                ],
            )

    return files.select("path", "content").mapInPandas(
        ingest_files, schema=FILES_INGEST_SCHEMA
    )


def resolve_outlinks(base_url: str, hrefs: list[str]) -> list[str]:
    """Resolve a page's raw hrefs into the absolute URLs a crawl
    frontier can fetch: RFC 3986 reference resolution (stdlib
    urljoin — relative paths, root-relative, protocol-relative all
    covered), fragments stripped (a frontier fetches documents, not
    anchors; a fragment-only href resolves to the page itself), and
    only http/https schemes kept (mailto:, javascript:, data: and
    friends are dropped).  Document order and duplicates preserved —
    dedup/politeness is the frontier's policy layer, not the
    resolver's."""
    from urllib.parse import urldefrag, urljoin, urlsplit

    out = []
    for href in hrefs:
        absolute, _ = urldefrag(urljoin(base_url, href.strip()))
        if urlsplit(absolute).scheme.lower() in ("http", "https"):
            out.append(absolute)
    return out

"""URL / domain-level corpus curation.

The standard CommonCrawl-style screens the text family lacked
(VERDICT r06 #6): host extraction, registrable-domain reduction,
domain blocklists, and per-domain document caps.  All pure DataFrame
algebra — parse_url and the joins run JVM-side; nothing collects
unbounded data.

Reference parity note: the reference (ParquetImporter.php) has no URL
handling at all; this module is part of the mandated LLM-pipeline
extension surface (SURVEY.md §2.C), modeled on the public-record
CommonCrawl/C4/RefinedWeb curation recipes (per-domain quotas +
blocklist screening before dedup).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def url_host(url: Column) -> Column:
    """Lower-cased host component of a URL (JVM try_parse_url — real
    URL parsing, not a regex guess).  NULL for unparseable values: web
    crawl URL columns are dirty by definition, and under ANSI mode the
    non-try parse_url would fail the whole job on the first malformed
    row."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def registrable_domain(host: Column) -> Column:
    """Registrable domain (eTLD+1) under the NAIVE two-label rule:
    the last two dot-labels of the host ('cdn.src3.com' -> 'src3.com').

    Production pipelines must replace this with a Public Suffix List
    lookup (a broadcast map join against the ~9k-entry PSL — 'co.uk'
    and friends are multi-label eTLDs the two-label rule gets wrong);
    the rule is kept naive here because the PSL is versioned external
    data, and the operator's call sites only need SOME deterministic
    host->domain reduction.  Hosts with fewer than two labels reduce
    to themselves."""
    return F.coalesce(
        F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit("")),
        host,
    )


def apply_domain_blocklist(
    df: DataFrame, domain_col: str, blocked: DataFrame
) -> DataFrame:
    """Drop every row whose domain appears in ``blocked`` (a 1-column
    DataFrame named like ``domain_col``).  Broadcast anti-join:
    blocklists are curated artifacts (10^3..10^6 rows), orders of
    magnitude under the broadcast threshold; the corpus never
    shuffles."""
    return df.join(F.broadcast(blocked), domain_col, "left_anti")


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    cap: int,
    order_by: list[Column],
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-domain document quota: keep at most ``cap`` rows per
    domain, the first ``cap`` in ``order_by`` order (deterministic —
    include a unique tiebreaker).  The anti-boilerplate screen every
    large-scale web-corpus recipe applies before dedup.

    Scale shape — the OVER-CAP-ONLY shuffle: a single global
    row_number window would shuffle and sort the whole corpus by
    domain; instead
      1. count rows per domain (map-side-combined aggregate, output
         is domain-cardinality);
      2. broadcast only the OVER-cap domain list.  Violators are
         bounded by n_rows/cap, and in real web corpora domain mass
         is Zipfian so the violator list is tiny; if a corpus ever
         produced a violator list too big to broadcast, fall back to
         the plain full window — same semantics, one big shuffle;
      3. rows in under-cap domains pass through UNSHUFFLED (broadcast
         anti-join); only the over-cap subset pays the window's
         shuffle+sort.
    Residual skew note: each violator domain ranks in one task.  The
    output side is cap-bounded, but the input side of a single
    billion-page domain would need per-partition pre-truncation
    before the window — not implemented; documented as the 1000x
    escape hatch.

    ``counts``: optionally pass a precomputed domain_counts() result
    so pass 1 isn't re-derived.  The counts relation itself is
    domain-cardinality — NEVER broadcast it wholesale (only the
    cap-bounded violator list is); consumers wanting per-domain
    pre-cap counts should join it at domain granularity after their
    own rollup, not row-level.
    """
    if counts is None:
        counts = domain_counts(df, domain_col)
    over = counts.filter(F.col("n_docs") > cap).select(domain_col)
    under_rows = df.join(F.broadcast(over), domain_col, "left_anti")
    over_rows = df.join(F.broadcast(over), domain_col, "left_semi")
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    capped = (
        over_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under_rows.unionByName(capped)


def domain_counts(df: DataFrame, domain_col: str) -> DataFrame:
    """Rows per domain: (domain_col, n_docs).  One map-side-combined
    aggregate; output is domain-cardinality."""
    return df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))

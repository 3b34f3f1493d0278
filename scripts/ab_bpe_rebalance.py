"""One-session A/B (optimization r14): text_bpe_encode with the
corpus-side encode stage at scan width (single row group at fixture
scale -> ONE task for the whole 5-replace merge chain — r13 shape) vs
the r14 conditional rebalance of the narrow (doc_id, text) input
before the word explode.  Interleaved, noop sink, same session.

Usage: python scripts/ab_bpe_rebalance.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def old_bpe_encode(spark, sf_dir):
    """r13 shape: aw inherits the scan's parallelism."""
    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.operators.text import (
        bpe_merge_sequence,
        bpe_symbol_count,
        ws_tokens,
    )
    from parquet_to_sql_spark.queries.text import _BPE_TOP

    docs = load_table(spark, sf_dir, "documents")
    aw = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word").rlike("^[a-z]+$"))
    vocab = aw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = vocab.select(
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 "
                "THEN transform(sequence(1, length(word)-1), i -> substr(word, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
        "wc",
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("mc"))
        .orderBy(F.desc("mc"), "pair")
        .limit(_BPE_TOP)
    )
    merges = top.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct((-F.col("mc")).alias("nmc"), "pair"))),
            lambda s: s["pair"],
        ).alias("ms")
    )
    enc = (
        aw.crossJoin(F.broadcast(merges))
        .select(
            "doc_id",
            F.length("word").cast("long").alias("n_before"),
            bpe_merge_sequence(F.col("word"), F.col("ms"), _BPE_TOP).alias("_seq"),
        )
        .select(
            "doc_id",
            "n_before",
            bpe_symbol_count(F.col("_seq")).alias("n_after"),
        )
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_before").cast("bigint").alias("n_sym_before"),
        F.sum("n_after").cast("bigint").alias("n_sym_after"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * (sum(n_before) - sum(n_after)))"
            " div sum(n_before) AS BIGINT)"
        ).alias("saved_ppm"),
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_to_sql_spark.queries.text import text_bpe_encode
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-bpe-rebalance")

    def build(variant):
        if variant == "old":
            return old_bpe_encode(spark, sf_dir)
        return text_bpe_encode(spark, sf_dir)

    a = {tuple(map(str, r)) for r in build("old").collect()}
    b = {tuple(map(str, r)) for r in build("new").collect()}
    assert a == b, f"variants disagree: {len(a ^ b)} differing rows"
    spark.catalog.clearCache()

    for v in ("old", "new"):
        build(v).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    samples = {"old": [], "new": []}
    for _ in range(reps):
        for v in samples:
            t0 = time.monotonic()
            build(v).write.format("noop").mode("overwrite").save()
            samples[v].append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    out = {
        v: {"median": round(med(xs), 3), "min": min(xs), "samples": xs}
        for v, xs in samples.items()
    }
    out["identical_output"] = True
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""One-session A/B (VERDICT r13 'Next round' #1): dedup_ngram_jaccard_hashed
with its shingle arrays fed by the Arrow kernel (current HEAD) vs the
retained JVM formulation (word_hashes + shingle_hashes_from HOFs, the
pre-e86bbb7 shape).  Both variants run interleaved in ONE Spark session
so host load hits both sides equally; timed action is the noop sink.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python scripts/ab_ngram_feed.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.functions.hashing import (
        shingle_hashes_from,
        word_hashes,
    )
    from parquet_to_sql_spark.operators import dedup
    from parquet_to_sql_spark.operators.text import (
        rebalance_for_compute,
        ws_tokens,
    )
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-ngram-feed")

    def jvm_arrays(df, id_col, text_col, n=3):
        return (
            rebalance_for_compute(df.select(id_col, text_col))
            .select(
                F.col(id_col).alias("doc"),
                word_hashes(ws_tokens(F.col(text_col))).alias("_hw"),
            )
            .select(
                "doc",
                F.array_distinct(shingle_hashes_from(F.col("_hw"), n)).alias("shs"),
            )
        )

    def build(arrays_fn):
        docs = load_table(spark, sf_dir, "documents")
        arrays = arrays_fn(docs, "doc_id", "text", 3)
        counts = dedup._array_overlap_counts(arrays)
        return (
            counts.withColumn(
                "jaccard",
                F.col("common").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("common")).cast("double"),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("doc1", "doc2", "jaccard")
        )

    variants = {"kernel": dedup.hashed_shingle_arrays, "jvm": jvm_arrays}
    # warmup both
    for fn in variants.values():
        build(fn).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    samples: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(reps):
        for v, fn in variants.items():
            t0 = time.monotonic()
            build(fn).write.format("noop").mode("overwrite").save()
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
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

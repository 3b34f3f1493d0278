"""One-session A/B (optimization r14): minhash_dedup_apply with the
r13 two-kernel-pass shape (minhash_lsh_candidates' explode+groupBy
signatures, separately checkpointed verify arrays) vs the r14
single-kernel-pass shape (sig_and_shingle_arrays).  Interleaved, noop
sink, same session.

Usage: python scripts/ab_dedup_apply.py [reps]
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

    from pyspark.sql import Window

    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.operators import dedup
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-dedup-apply")

    def old_apply(df, id_col, text_col, k=8, bands=4, n=3, tau=0.5):
        cand = dedup.minhash_lsh_candidates(
            df, id_col, text_col, k=k, bands=bands, n=n
        )
        arrays = dedup.hashed_shingle_arrays(
            df, id_col, text_col, n=n
        ).localCheckpoint()
        a1 = arrays.select(F.col("doc").alias("doc1"), F.col("shs").alias("shs1"))
        a2 = arrays.select(F.col("doc").alias("doc2"), F.col("shs").alias("shs2"))
        common = F.size(F.array_intersect(F.col("shs1"), F.col("shs2")))
        union_sz = F.size("shs1") + F.size("shs2") - common
        verified = (
            cand.join(a1, "doc1")
            .join(a2, "doc2")
            .withColumn("_j", common.cast("double") / union_sz.cast("double"))
            .filter(F.col("_j") >= F.lit(tau))
            .select("doc1", "doc2")
        )
        comp = dedup.connected_components(
            verified, df.select(id_col), "doc1", "doc2", id_col
        )
        return comp.join(df, comp["node"] == df[id_col]).select(
            F.col("node").alias(id_col),
            F.col("label").alias("component"),
            F.count(F.lit(1)).over(Window.partitionBy("label")).alias("cluster_size"),
            (F.col("node") == F.col("label")).alias("is_keep"),
            F.length(text_col).cast("bigint").alias("n_chars"),
        )

    def build(variant):
        docs = load_table(spark, sf_dir, "documents")
        fn = old_apply if variant == "old" else dedup.minhash_dedup_apply
        return fn(docs, "doc_id", "text", k=8, bands=4, n=3, tau=0.5)

    # equality check once: identical output rows
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

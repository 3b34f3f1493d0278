"""One-session A/B (optimization r14): dedup_graph_triangles with the
closing join's required hash exchanges left to ENSURE_REQUIREMENTS
(AQE byte-coalesces the tiny-bytes/heavy-compute intersect stage to
1-2 tasks — r13 shape) vs the r14 user-specified repartition on the
join keys (same exchange count and bytes, width pinned to the
session's shuffle parallelism).  Interleaved, noop sink, same session.

Usage: python scripts/ab_triangles_width.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def old_triangle_counts(edges, a="doc1", b="doc2"):
    """r13 tail: attach joins left entirely to ENSURE_REQUIREMENTS."""
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    e = e.localCheckpoint()
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("u").alias("_du"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("_dv"), F.col("deg").alias("deg_v"))
    ranked = e.join(du, e["u"] == du["_du"]).join(dv, e["v"] == dv["_dv"])
    lower = F.struct(F.col("deg_u"), F.col("u")) < F.struct(
        F.col("deg_v"), F.col("v")
    )
    o = ranked.select(
        F.when(lower, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()
    adj = o.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    a1 = adj.select(F.col("src").alias("_a1"), F.col("nbrs").alias("n1"))
    a2 = adj.select(F.col("src").alias("_a2"), F.col("nbrs").alias("n2"))
    tri = (
        o.join(a1, o["src"] == a1["_a1"])
        .join(a2, o["dst"] == a2["_a2"])
        .select(
            "src", "dst", F.explode(F.array_intersect("n1", "n2")).alias("w")
        )
    )
    verts = tri.select(F.explode(F.array("src", "dst", "w")).alias("doc_id"))
    return verts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.operators.dedup import simhash_hamming_pairs
    from parquet_to_sql_spark.queries.dedup import dedup_graph_triangles
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-triangles-width")

    def build(variant):
        if variant == "old":
            docs = load_table(spark, sf_dir, "documents")
            edges = simhash_hamming_pairs(
                docs, "doc_id", "text", bits=24, radius=1
            )
            return old_triangle_counts(edges)
        return dedup_graph_triangles(spark, sf_dir)

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

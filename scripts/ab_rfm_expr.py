"""One-session A/B (optimization r14, VERDICT item 2): ev_rfm_segments
with Column-API construction (F.when chains — r13 shape) vs the r14
expr-string construction.  The physical plan is expected IDENTICAL —
the change only collapses ~140 py4j round trips of driver-side
expression building into ~25.  Interleaved, noop sink, same session.

Usage: python scripts/ab_rfm_expr.py [reps]
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
    from parquet_to_sql_spark.operators.prefix import grouped_prefix_sum
    from parquet_to_sql_spark.queries import events
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-rfm-expr")

    def old_rfm():
        ev = load_table(spark, sf_dir, "events")
        users = ev.groupBy("user_id").agg(
            F.max(F.unix_timestamp("ts")).cast("long").alias("r"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("m"),
        ).localCheckpoint(eager=False)
        counts = (
            users.selectExpr("stack(3, 'r', r, 'f', f, 'm', m) AS (metric, v)")
            .groupBy("metric", "v")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        cum = grouped_prefix_sum(counts, ["metric"], ["v"], "cnt", "cum")
        totals = cum.groupBy("metric").agg(F.max("cum").alias("n"))
        per_metric = (
            cum.join(F.broadcast(totals), "metric")
            .groupBy("metric")
            .agg(
                *[
                    F.min(
                        F.when(
                            F.col("cum") * 100 >= F.lit(q) * F.col("n"),
                            F.col("v"),
                        )
                    ).alias(f"b{q}")
                    for q in (20, 40, 60, 80)
                ]
            )
        )
        b = per_metric.agg(
            *[
                F.min(F.when(F.col("metric") == m, F.col(f"b{q}"))).alias(
                    f"{m}{q}"
                )
                for m in ("r", "f", "m")
                for q in (20, 40, 60, 80)
            ]
        )

        def score(metric: str) -> F.Column:
            s = F.lit(1)
            for q in (20, 40, 60, 80):
                s = s + F.when(
                    F.col(metric) > F.col(f"{metric}{q}"), 1
                ).otherwise(0)
            return s.alias(f"{metric}_score")

        scored = users.crossJoin(F.broadcast(b)).select(
            score("r"), score("f"), score("m"), "m"
        )
        return scored.groupBy("r_score", "f_score", "m_score").agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("m").cast("long").alias("m_cents"),
        )

    def build(variant):
        if variant == "old":
            return old_rfm()
        return events.ev_rfm_segments(spark, sf_dir)

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

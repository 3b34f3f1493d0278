"""One-session A/B (optimization r14): ev_peak_concurrency with its
two window exchanges left to ENSURE_REQUIREMENTS (AQE byte-coalesces
each to ~2 tasks at sf0.1 — r13 shape) vs the r14 user-specified
repartition on the window partition keys (same exchange count and
bytes, width pinned).  Interleaved, noop sink, same session.

Outcome (plans/r14/AB_peak_width.json): REJECTED — the pin made the
row 38% slower (0.792 -> 1.097 s median); each window stage holds
only ~0.5 s of total compute, so 32-way sort/schedule overhead
exceeds the parallelism gain.  The query keeps the r13 shape (old ==
new if re-run against the final tree); the finding is noted inline
in ev_peak_concurrency.

Usage: python scripts/ab_peak_width.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def old_peak(spark, sf_dir):
    """r13 shape: window exchanges left to ENSURE_REQUIREMENTS."""
    from pyspark.sql import Window

    from parquet_to_sql_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= gap_us),
        1,
    ).otherwise(0)
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        e.withColumn("is_new", is_new)
        .withColumn("island", F.sum("is_new").over(run_w))
        .groupBy("user_id", "island")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
    )
    hour_us = 3_600_000_000
    deltas = (
        sessions.select(
            F.col("start_us").alias("t_us"), F.lit(1).alias("delta")
        )
        .unionByName(
            sessions.select(
                (F.col("end_us") + F.lit(1)).alias("t_us"),
                F.lit(-1).alias("delta"),
            )
        )
        .withColumn(
            "hour_us",
            (F.floor(F.col("t_us") / F.lit(hour_us)) * F.lit(hour_us)).cast(
                "long"
            ),
        )
    )
    in_hour = Window.partitionBy("hour_us").orderBy("t_us", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hours_before = Window.orderBy("hour_us").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        deltas.groupBy("hour_us")
        .agg(F.sum("delta").alias("tot"))
        .select(
            "hour_us",
            F.coalesce(F.sum("tot").over(hours_before), F.lit(0)).alias(
                "prev"
            ),
        )
    )
    return (
        deltas.withColumn("run", F.sum("delta").over(in_hour))
        .join(F.broadcast(offsets), "hour_us")
        .groupBy("hour_us")
        .agg(
            F.max(F.col("run") + F.col("prev")).cast("long").alias(
                "peak_concurrent"
            )
        )
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from parquet_to_sql_spark.queries.events import ev_peak_concurrency
    from parquet_to_sql_spark.session import get_spark

    spark = get_spark(app_name="ab-peak-width")

    def build(variant):
        if variant == "old":
            return old_peak(spark, sf_dir)
        return ev_peak_concurrency(spark, sf_dir)

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

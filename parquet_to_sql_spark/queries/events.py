"""Event-time windowing over the `events` table (batch form).

These are the batch equivalents of the Structured Streaming pipeline
in parquet_to_sql_spark/streaming/ — same window semantics
(epoch-aligned tumbling/sliding windows, gap-based session windows),
checked against a pure-SQL DuckDB oracle. The streaming versions add
watermarks; the window assignment logic is identical, which is what
these oracles pin down.

DuckDB reads events.ts as TIMESTAMP_NS while the engine truncates to
microseconds (catalog.py), so every oracle casts ts first — the cast
truncates identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query

VALUE_DEC = "CAST(value AS DECIMAL(12,2))"


@query(
    "ev_tumbling_hourly",
    headline=True,
    tags=("events", "window-agg", "streaming-equivalent"),
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({VALUE_DEC}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(VALUE_DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@query(
    "ev_sliding_windows",
    tags=("events", "window-agg", "streaming-equivalent"),
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b30, event_type
      FROM events
    ), cand AS (
      SELECT b30 AS window_start, event_type FROM b
      UNION ALL
      SELECT b30 - INTERVAL '30 minutes', event_type FROM b
    )
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM cand
    GROUP BY window_start, event_type
    """,
)
def ev_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands in
    two windows. The oracle materializes the same two epoch-aligned
    window starts per event."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@query(
    "ev_session_windows",
    tags=("events", "session-window", "streaming-equivalent"),
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ), numbered AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def ev_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min inactivity gap) per user.
    Spark's session_window closes a session when the next event is >=
    gap after the previous one; the oracle reproduces that with a
    gaps-and-islands window construction."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@query(
    "ev_dedup_first_per_key",
    tags=("events", "dedup", "streaming-equivalent"),
    oracle="""
    SELECT user_id, event_type,
           MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
           CAST(MIN_BY(event_id, CAST(ts AS TIMESTAMP)) AS BIGINT) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
)
def ev_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest event per (user, type) — the batch analogue of
    streaming dropDuplicates on a key with event-time ordering.

    (Timestamps are unique per key at µs precision in this dataset, so
    min_by on ts alone is deterministic in both engines.)"""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"),
        F.min_by("event_id", "ts").alias("first_event_id"),
    )


@query(
    "ev_funnel_signup_purchase",
    tags=("events", "funnel"),
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN first_signup IS NOT NULL AND first_purchase > first_signup
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM firsts
    """,
)
def ev_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users who signed up, and of those, purchased
    AFTER their first signup — one conditional-MIN aggregate per user,
    then one global rollup. Two shuffles total at any scale."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)).alias("n_signed_up"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


@query(
    "ev_retention_day1",
    tags=("events", "retention"),
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events
    ), cohort AS (
      SELECT user_id, MIN(d) AS first_day FROM days GROUP BY user_id
    )
    SELECT cohort.first_day AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS cohort_size,
           CAST(SUM(CASE WHEN ret.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_day1
    FROM cohort
    LEFT JOIN days ret
      ON ret.user_id = cohort.user_id
     AND ret.d = cohort.first_day + INTERVAL 1 DAY
    GROUP BY cohort.first_day
    """,
)
def ev_retention_day1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-1 retention cohorts: users grouped by first active day,
    counted if active again the next day. distinct-days -> cohort ->
    self left-join on (user, day+1)."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("first_day"))
    ret = days.select(
        F.col("user_id").alias("r_user"), F.col("d").alias("r_d")
    )
    joined = cohort.join(
        ret,
        (F.col("r_user") == F.col("user_id"))
        & (F.col("r_d") == F.col("first_day") + F.expr("INTERVAL 1 DAY")),
        "left",
    )
    return joined.groupBy(F.col("first_day").alias("cohort_day")).agg(
        F.count(F.lit(1)).alias("cohort_size"),
        F.sum(F.when(F.col("r_user").isNotNull(), 1).otherwise(0)).alias("retained_day1"),
    )


@query(
    "ev_gaps_and_islands",
    tags=("events", "window", "sessionization"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    )
    SELECT user_id,
           CAST(island AS BIGINT)                       AS island,
           CAST(MIN(epoch_us(ts)) AS BIGINT)            AS start_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT)            AS end_us,
           CAST(COUNT(*) AS BIGINT)                     AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM isl
    GROUP BY user_id, island
    """,
)
def ev_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual gaps-and-islands sessionization — the batch-side window
    construction (lag -> new-island flag -> running sum) users need
    when gap logic is custom and the built-in session_window can't
    express it (ev_session_windows pins the built-in).  Two window
    passes over the same (user, ts) ordering, so Catalyst reuses ONE
    shuffle+sort for both."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= gap_us),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("is_new", is_new)
        .withColumn("island", F.sum("is_new").over(run).cast("long"))
        .groupBy("user_id", "island")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
    )


@query(
    "ev_peak_concurrency",
    headline=True,
    tags=("events", "interval-algebra", "sweep-line", "scale-path"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    ), s AS (
      SELECT user_id, island,
             MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
      FROM isl GROUP BY user_id, island
    ), d AS (
      SELECT start_us AS t_us, 1 AS delta FROM s
      UNION ALL
      SELECT end_us + 1, -1 FROM s
    ), r AS (
      SELECT t_us, delta,
             SUM(delta) OVER (ORDER BY t_us, delta
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM d
    )
    SELECT CAST((t_us // 3600000000) * 3600000000 AS BIGINT) AS hour_us,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrent
    FROM r GROUP BY 1
    """,
)
def ev_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user sessions per hour — interval-overlap
    counting by SWEEP LINE instead of a quadratic interval self-join:
    sessionize (same 30-min-gap islands as ev_gaps_and_islands), turn
    each session [start, end] into a +1 delta at start and a -1 delta
    at end+1us (closed interval, tie-safe because equal-timestamp rows
    order -1 before +1), and prefix-sum the deltas in time order; the
    running sum AT each transition point is the live concurrency.

    The naive form is a single global ORDER BY window — one task, the
    classic sweep-line scale killer.  Here the prefix sum is
    DECOMPOSED: (1) a per-HOUR running sum, shuffled and windowed on
    hour_us like any partitioned window; (2) an exclusive prefix over
    per-hour delta TOTALS — a relation bounded by the number of hours
    in the corpus (~9k rows/decade) regardless of event count, so its
    unpartitioned window is a deliberate, bounded exception;
    (3) broadcast the hour offsets back and add.  Associativity makes
    the decomposition value-identical to the global scan, and
    everything is integer micros — cross-engine exact.

    Hours with no session transitions are absent from the output
    (concurrency is constant across them); the per-hour peak is the
    max over transition points inside that hour."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    # (r14 note — measured and REJECTED: pinning the two window
    # exchanges' width with user-specified repartitions — the
    # triangle_counts fix — made THIS row 38% SLOWER (interleaved
    # A/B, plans/r14/AB_peak_width.json): AQE's ~2-task coalescing
    # is right here because each window stage holds only ~0.5 s of
    # TOTAL compute, and 32-way sort/schedule overhead exceeds the
    # parallelism gain.  The pin pays off only when a coalesced
    # stage carries ~a second or more of serial compute.)
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
    # bounded-by-hour-count relation: the unpartitioned window here is
    # over per-hour totals, never per-event rows
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


@query(
    "ev_gapfill_daily",
    tags=("events", "timeseries", "gapfill"),
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(value AS DECIMAL(12,2)) AS v0
      FROM events WHERE event_type = 'purchase'
    ), daily AS (
      SELECT user_id, d, SUM(v0) AS v FROM p GROUP BY user_id, d
    ), span AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      FROM span
    ), j AS (
      SELECT g.user_id, g.d, daily.v
      FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
    )
    SELECT user_id,
           CAST(epoch_us(d) AS BIGINT) AS day_us,
           CAST(last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY d
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS filled_value,
           (v IS NULL) AS is_gap
    FROM j
    """,
)
def ev_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling — the hypertable-style densify+locf:
    per user, a complete daily grid over their active span
    (sequence + explode), daily purchase totals left-joined on, and
    missing days forward-filled with last(ignorenulls) (LOCF).  Sums
    stay DECIMAL through the fill and cast to double once at the
    output, so the fill copies exact values.  The grid explode is
    map-side (one row per user expands in place); the only shuffles
    are the daily aggregate and the per-user window — both on the
    same user key."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("v"))
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    j = grid.join(daily, ["user_id", "d"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.unix_micros("d").alias("day_us"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("filled_value"),
        F.col("v").isNull().alias("is_gap"),
    )


@query(
    "ev_scd2_intervals",
    tags=("events", "scd2", "cdc"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(lead(ts) OVER w) AS BIGINT) AS valid_to_us,
           (lead(ts) OVER w IS NULL) AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version,
           value
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ev_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval construction from a change stream: each
    change row becomes a validity interval [ts, next change ts) via
    lead(), the open interval marked current — how a CDC feed turns
    into a slowly-changing-dimension table.  ONE window over (user,
    ts) produces valid_to, is_current, and version together: Catalyst
    computes all three in a single sort+shuffle.  value passes
    through untouched (exact), interval bounds are epoch micros."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
        "value",
    )


@query(
    "ev_ewma_user_value",
    tags=("events", "time-series", "stateful-fold"),
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           list_reduce(
             list_transform(
               list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
               v -> CAST(v AS DOUBLE)),
             (acc, v) -> 0.25 * v + 0.75 * acc
           ) AS ewma_value
    FROM events
    GROUP BY user_id
    """,
)
def ev_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha = 0.25), ordered by
    (ts, event_id): the recursive smoothing fold NO standard window
    function can express (each output depends on the previous output,
    not a frame aggregate) — the canonical per-entity time-series
    state shape.

    Implementation: one shuffle on user_id, sort_array over the
    collected (ts, event_id, value) structs (event_id breaks ts ties,
    so the order is total), then a left fold seeded by the FIRST value
    — exactly DuckDB list_reduce's first-element-as-init semantics, so
    with alpha/1-alpha both exact binary fractions (0.25/0.75) the
    IEEE fold is bit-identical cross-engine.

    100 TB story: state per group is the user's event list — the same
    per-entity boundedness assumption applyInPandasWithState makes; at
    unbounded history, fold per (user, day) and chain daily states.
    All JVM expressions, no UDF, map-side partial collect."""
    events = load_table(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "_seq"
        ),
    )
    ewma = F.aggregate(
        F.col("_seq"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"].cast("double")).otherwise(
            F.lit(0.25) * x["value"].cast("double") + F.lit(0.75) * acc
        ),
    )
    return seq.select("user_id", "n_events", ewma.alias("ewma_value"))


@query(
    "ev_time_weighted_avg",
    tags=("events", "timeseries", "hypertable"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), o AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS t_us,
             CAST(floor(value * 100.0) AS BIGINT) AS qv,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt_us
      FROM e
    ), seg AS (
      SELECT user_id, qv, COALESCE(nxt_us - t_us, 0) AS dur_us FROM o
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CASE WHEN SUM(dur_us) > 0
                THEN CAST(SUM(CAST(qv AS HUGEINT) * dur_us) AS DOUBLE)
                     / CAST(SUM(dur_us) AS DOUBLE) / 100.0
           END AS twa_value
    FROM seg GROUP BY user_id
    """,
)
def ev_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of the value series — the
    hypertable/monitoring aggregate (TimescaleDB's time_weight with
    LOCF interpolation): each observation holds until the next one, so
    its weight is the holding duration, not 1.  A plain AVG
    over-weights bursts; the TWA is burst-invariant.

    Exactness discipline: values quantize to cents via floor(v*100)
    (floor of IEEE arithmetic, cross-engine deterministic), durations
    are integer micros from lead(), and the weighted sum accumulates
    qv*dur products in DECIMAL(38,0) — nothing inexact until the one
    final division.  The last observation per user has no successor
    and weighs 0; single-event users yield NULL (zero total duration).

    Scale shape: one window and one groupBy, BOTH keyed on user_id —
    Catalyst reuses a single shuffle+sort for the lead() and the
    aggregation."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * F.lit(100.0)).cast("long").alias("qv"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt_us"),
    ).select(
        "user_id",
        "qv",
        F.coalesce(F.col("nxt_us") - F.col("t_us"), F.lit(0)).alias(
            "dur_us"
        ),
    )
    dec = "decimal(38,0)"
    g = o.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # the PRODUCT must be decimal, not just the sum: a long
        # qv*dur_us can exceed 2^63 (large value x long holding gap)
        F.sum(F.col("qv").cast(dec) * F.col("dur_us")).alias("wsum"),
        F.sum(F.col("dur_us").cast(dec)).alias("dsum"),
    )
    twa = F.when(
        F.col("dsum") > F.lit(0),
        F.col("wsum").cast("double")
        / F.col("dsum").cast("double")
        / F.lit(100.0),
    )
    return g.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        twa.alias("twa_value"),
    )


@query(
    "ev_hourly_anomaly_mad",
    tags=("events", "anomaly", "robust-stats"),
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, 2 * quantile_cont(n_events, 0.5) AS med2
      FROM hourly GROUP BY event_type
    ), dev AS (
      SELECT h.hour_ts, h.event_type, h.n_events,
             CAST(abs(2 * h.n_events - m.med2) AS BIGINT) AS dev2
      FROM hourly h JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, 2 * quantile_cont(dev2, 0.5) AS mad4
      FROM dev GROUP BY event_type
    )
    SELECT d.hour_ts, d.event_type,
           CAST(d.n_events AS BIGINT) AS n_events, d.dev2,
           (2 * d.dev2 > 3 * m2.mad4) AS is_anomaly
    FROM dev d JOIN mad m2 USING (event_type)
    """,
)
def ev_hourly_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on hourly event volumes: flag hours
    whose count deviates from the per-type median by more than 3x the
    median absolute deviation.  Exactness trick: medians of integers
    interpolate to halves, so everything is carried doubled
    (med2 = 2*median, dev2 = 2*|c - med|, mad4 = 4*MAD) and the 3-MAD
    rule becomes the integer comparison 2*dev2 > 3*mad4 — no float
    discipline needed.  Scale shape: one shuffle builds the hourly
    relation, which is then localCheckpoint'd so the raw event table
    is scanned ONCE (four downstream references would otherwise replay
    the scan+agg each); both median passes aggregate the
    (hours x types) rollup, bounded by time-range/cardinality, not by
    event volume; the per-type stats join back via broadcast."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint()
    )
    med = hourly.groupBy("event_type").agg(
        (F.lit(2) * F.expr("percentile(n_events, 0.5)")).alias("med2")
    )
    dev = hourly.join(F.broadcast(med), "event_type").select(
        "hour_ts",
        "event_type",
        "n_events",
        F.abs(F.lit(2) * F.col("n_events") - F.col("med2")).cast("long").alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        (F.lit(2) * F.expr("percentile(dev2, 0.5)")).alias("mad4")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "hour_ts",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "dev2",
        (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4")).alias("is_anomaly"),
    )


@query(
    "ev_value_log2_histogram",
    tags=("events", "histogram", "scale-path"),
    oracle="""
    WITH c AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT CAST(length(bin(cents)) AS INT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT)        AS n_events,
           MIN(cents)                      AS min_cents,
           MAX(cents)                      AS max_cents
    FROM c GROUP BY log2_bucket
    """,
)
def ev_value_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (HdrHistogram-style) value histogram: bucket =
    position of the highest set bit of the cent-quantized value,
    computed engine-neutrally as length(bin(x)) — no float log2, so
    boundary values land in the same bucket on every engine.  Log
    bucketing gives constant relative error with a fixed, tiny bucket
    count, which is why it is the standard shape for latency/size
    distributions at scale: one map-side-combinable aggregation whose
    state is bounded by ~64 buckets regardless of input volume."""
    e = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")
    return (
        e.select(cents.alias("cents"))
        .select(F.length(F.bin(F.col("cents"))).alias("log2_bucket"), "cents")
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


@query(
    "ev_gapfill_linear",
    tags=("events", "timeseries", "gapfill"),
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(value AS DECIMAL(12,2)) AS v0
      FROM events WHERE event_type = 'purchase'
    ), daily AS (
      SELECT user_id, d, CAST(SUM(v0) * 100 AS BIGINT) AS vc
      FROM p GROUP BY user_id, d
    ), span AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      FROM span
    ), j AS (
      SELECT g.user_id, g.d, daily.vc
      FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
    ), n AS (
      SELECT user_id, d, vc,
             last_value(vc IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(vc IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN vc IS NOT NULL THEN d END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id,
           CAST(epoch_us(d) AS BIGINT) AS day_us,
           (vc IS NULL) AS is_gap,
           CASE WHEN vc IS NOT NULL THEN vc * 1000
                ELSE pv * 1000 + ((nv - pv) * date_diff('day', pd, d) * 1000)
                     // date_diff('day', pd, nd)
           END AS interp_milli_cents
    FROM n
    """,
)
def ev_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with LINEAR interpolation (the hypertable
    `interpolate()` twin of ev_gapfill_daily's LOCF): missing days get
    prev + (next - prev) * elapsed/span, carried entirely in integer
    milli-cents with one integer division — no float arithmetic, so
    no cross-engine rounding surface at all.  Every gap has both
    neighbors by construction (the grid spans each user's first..last
    known day).  Same scale shape as the LOCF variant: map-side grid
    explode, daily aggregate + two symmetric windows, all on the
    user_id shuffle key."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)").alias(
                "vc"
            )
        )
    )
    span = daily.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    j = grid.join(daily, ["user_id", "d"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_d = F.when(F.col("vc").isNotNull(), F.col("d"))
    n = j.select(
        "user_id",
        "d",
        "vc",
        F.last("vc", ignorenulls=True).over(back).alias("pv"),
        F.last(known_d, ignorenulls=True).over(back).alias("pd"),
        F.first("vc", ignorenulls=True).over(fwd).alias("nv"),
        F.first(known_d, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = F.when(F.col("vc").isNotNull(), F.col("vc") * 1000).otherwise(
        F.col("pv") * 1000
        + F.expr("((nv - pv) * datediff(d, pd) * 1000) div datediff(nd, pd)")
    )
    return n.select(
        "user_id",
        F.unix_micros(F.col("d")).alias("day_us"),
        F.col("vc").isNull().alias("is_gap"),
        interp.alias("interp_milli_cents"),
    )


@query(
    "ev_funnel_three_step",
    tags=("events", "funnel"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), s1 AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
      FROM e GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'view' AND s1.t1 IS NOT NULL AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_then_view,
           CAST(SUM(CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_then_purchase
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def ev_funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (signup -> view -> purchase, each
    step strictly after the previous completion): step k's earliest
    qualifying time comes from one aggregation constrained by step
    k-1's result — a chain of per-user aggregates and joins, all on
    the user_id shuffle key, so the whole funnel reuses ONE
    partitioning however many steps it has.  Timestamps compare
    exactly (integer micros), so the funnel counts carry no float
    surface."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1")
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1.filter(F.col("t1").isNotNull()), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    j = (
        s1.join(s2.select("user_id", "t2"), "user_id", "left")
        .join(s3.select("user_id", "t3"), "user_id", "left")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).alias("n_signup"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).alias("n_then_view"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0)).alias("n_then_purchase"),
    )


@query(
    "ev_sliding_distinct_users",
    tags=("events", "window-agg", "distinct"),
    oracle="""
    WITH b AS (
      SELECT DISTINCT
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b30,
             user_id
      FROM events
    ), cand AS (
      SELECT b30 AS window_start, user_id FROM b
      UNION ALL
      SELECT b30 - INTERVAL '30 minutes', user_id FROM b
    )
    SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM cand GROUP BY window_start
    """,
)
def ev_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per sliding window (1 h length, 30 min
    slide) — the two-level-aggregation shape for distinct counts over
    overlapping windows: dedupe (window, user) first (each user
    contributes once per window however many events they have), then
    count per window.  The first level carries the map-side combine;
    replication factor is windows-per-event (2), never event volume."""
    e = load_table(spark, sf_dir, "events")
    wu = (
        e.select(F.window("ts", "1 hour", "30 minutes").alias("w"), "user_id")
        .select(F.col("w.start").alias("window_start"), "user_id")
        .distinct()
    )
    return wu.groupBy("window_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@query(
    "ev_bitmap_rollup_weekly_users",
    tags=("events", "distinct", "spark4", "scale-path"),
    oracle="""
    SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS week_ts,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS weekly_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY week_ts
    """,
)
def ev_bitmap_rollup_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users by MERGING daily bitmap states — the
    materialized-rollup shape for range distinct counts: per
    (day, bucket) user bitmaps are the stored daily aggregate, and
    any coarser period (here ISO week) is an associative bitmap_or_agg
    merge of its days — exact, so the oracle is plain
    COUNT(DISTINCT).  In production the daily states are a table
    maintained incrementally (see pipeline_incremental_distinct_
    bitmap); a year-to-date query then merges 365 fixed-size states
    instead of rescanning a year of raw events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.expr("bitmap_bucket_number(user_id)").alias("_b"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("_m"),
        F.count(F.lit(1)).alias("_n"),
    )
    weekly = (
        daily.groupBy(F.date_trunc("week", F.col("day_ts")).alias("week_ts"), "_b")
        .agg(F.expr("bitmap_or_agg(_m)").alias("_m"), F.sum("_n").alias("_n"))
    )
    return weekly.groupBy("week_ts").agg(
        F.expr("sum(bitmap_count(_m))").alias("weekly_users"),
        F.sum("_n").alias("n_events"),
    )


@query(
    "ev_cohort_retention_matrix",
    tags=("events", "retention", "cohort"),
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM days GROUP BY user_id
    )
    SELECT c.cohort_wk,
           CAST(date_diff('day', c.cohort_wk, d.wk) // 7 AS INT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM cohort c JOIN days d ON d.user_id = c.user_id
    GROUP BY c.cohort_wk, week_offset
    """,
)
def ev_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full cohort-retention triangle (first-active week x week
    offset -> active users) — the generalization of ev_retention_day1
    to every offset at once.  (user, week) pairs dedupe first, so each
    user counts once per (cohort, offset) cell and COUNT(*) IS the
    distinct count; the week offset is an exact integer day-difference
    div 7 (both engines truncate identically on the week-aligned
    grid).  Scale shape: dedup and cohort-min share the user_id
    shuffle; the matrix is (weeks x weeks)-bounded output."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
        .distinct()
    )
    cohort = days.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    j = days.join(cohort, "user_id")
    return (
        j.select(
            "cohort_wk",
            F.expr("CAST(datediff(wk, cohort_wk) div 7 AS INT)").alias("week_offset"),
        )
        .groupBy("cohort_wk", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


_DUCK_EPOCH_TS = "CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)"


def _duck_rfm_bounds(metric: str, alias: str) -> str:
    """Quintile boundaries for one RFM metric via the count-histogram
    method (type-1 lower quantiles over per-user values)."""
    return f"""(
      SELECT
        MIN(CASE WHEN cum*100 >= 20*n THEN v END) AS {alias}20,
        MIN(CASE WHEN cum*100 >= 40*n THEN v END) AS {alias}40,
        MIN(CASE WHEN cum*100 >= 60*n THEN v END) AS {alias}60,
        MIN(CASE WHEN cum*100 >= 80*n THEN v END) AS {alias}80
      FROM (
        SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n
        FROM (SELECT {metric} AS v, COUNT(*) AS cnt FROM u GROUP BY {metric})
      )
    )"""


@query(
    "ev_rfm_segments",
    headline=True,
    tags=("events", "quantiles", "segmentation", "scale-path"),
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MAX({_DUCK_EPOCH_TS}) AS r,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    rb AS {_duck_rfm_bounds('r', 'r')},
    fb AS {_duck_rfm_bounds('f', 'f')},
    mb AS {_duck_rfm_bounds('m', 'm')},
    scored AS (
      SELECT
        1 + (CASE WHEN r > r20 THEN 1 ELSE 0 END)
          + (CASE WHEN r > r40 THEN 1 ELSE 0 END)
          + (CASE WHEN r > r60 THEN 1 ELSE 0 END)
          + (CASE WHEN r > r80 THEN 1 ELSE 0 END) AS r_score,
        1 + (CASE WHEN f > f20 THEN 1 ELSE 0 END)
          + (CASE WHEN f > f40 THEN 1 ELSE 0 END)
          + (CASE WHEN f > f60 THEN 1 ELSE 0 END)
          + (CASE WHEN f > f80 THEN 1 ELSE 0 END) AS f_score,
        1 + (CASE WHEN m > m20 THEN 1 ELSE 0 END)
          + (CASE WHEN m > m40 THEN 1 ELSE 0 END)
          + (CASE WHEN m > m60 THEN 1 ELSE 0 END)
          + (CASE WHEN m > m80 THEN 1 ELSE 0 END) AS m_score,
        m
      FROM u, rb, fb, mb
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(m) AS BIGINT) AS m_cents
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    the classic user-value cube, built SCALE-SAFE: the naive
    formulation is ``ntile(5) OVER (ORDER BY metric)`` three times,
    each an unpartitioned global sort of every user row in ONE task.
    Here each metric's quintile boundaries come from the exact
    count-histogram method instead (per-value counts, then ONE
    GROUPED distributed prefix sum over all three metrics' distinct
    values stacked — operators.prefix.grouped_prefix_sum; r7 rewrite
    of the r6 three-independent-prefix-sum formulation, collapsing
    three eager checkpoint+collect pipelines into a single
    collect-free one), and the 12 boundaries ride a 1-row broadcast
    attach; scoring is then row-local comparisons.  All integer
    (epoch seconds, counts, cents): value-exact cross-engine.  Higher
    epoch = more recent = higher r_score, matching the marketing
    convention."""
    from parquet_to_sql_spark.operators.prefix import grouped_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    # materialized ONCE: the relation feeds the stacked bounds
    # pipeline (eagerly executed by the prefix scan's checkpoint)
    # plus the scoring pass (r6 review; same pattern as
    # mmr_rerank_int's pool).  LAZY (r14): grouped_prefix_sum's own
    # EAGER checkpoint is the first action and materializes this
    # relation inside its job; the scoring pass then reads the cached
    # copy — deterministic aggregate values either way, one fewer
    # serialized job per rep.
    users = ev.groupBy("user_id").agg(
        F.max(F.unix_timestamp("ts")).cast("long").alias("r"),
        F.count(F.lit(1)).cast("long").alias("f"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("m"),
    ).localCheckpoint(eager=False)

    # one prefix scan for all three metrics: stack to (metric, v),
    # count per distinct value, grouped running sum, then the
    # smallest v at-or-past each 20% rank per metric
    counts = (
        users.selectExpr("stack(3, 'r', r, 'f', f, 'm', m) AS (metric, v)")
        .groupBy("metric", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cum = grouped_prefix_sum(counts, ["metric"], ["v"], "cnt", "cum")
    totals = cum.groupBy("metric").agg(F.max("cum").alias("n"))
    # Boundary/pivot/scoring expressions are built as SQL strings —
    # ONE py4j round trip per column instead of one per Column-API
    # node (r14, VERDICT item 2: the proven expr-string construction
    # from pq_adc; ~140 fewer driver round trips per rep, expressions
    # identical to the former F.when chains).
    per_metric = (
        cum.join(F.broadcast(totals), "metric")  # 3-row attach
        .groupBy("metric")
        .agg(
            *[
                F.expr(
                    f"min(CASE WHEN cum * 100 >= {q} * n THEN v END)"
                    f" AS b{q}"
                )
                for q in (20, 40, 60, 80)
            ]
        )
    )
    # pivot the 3 boundary rows into the single broadcast row the
    # scoring pass consumes (r20..m80)
    b = per_metric.agg(
        *[
            F.expr(
                f"min(CASE WHEN metric = '{m}' THEN b{q} END) AS {m}{q}"
            )
            for m in ("r", "f", "m")
            for q in (20, 40, 60, 80)
        ]
    )

    def score(metric: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN {metric} > {metric}{q} THEN 1 ELSE 0 END)"
            for q in (20, 40, 60, 80)
        )
        return f"1 + {terms} AS {metric}_score"

    scored = users.crossJoin(F.broadcast(b)).selectExpr(
        score("r"), score("f"), score("m"), "m"
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_users"),
        F.expr("CAST(sum(m) AS BIGINT) AS m_cents"),
    )


@query(
    "ev_event_transitions",
    tags=("events", "sequence", "llm-pipeline"),
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type, event_type AS next_type FROM o
      WHERE prev_type IS NOT NULL
    ), c AS (
      SELECT prev_type, next_type, COUNT(*) AS n FROM t GROUP BY 1, 2
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n_transitions,
           CAST((1000000::HUGEINT * n)
                // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_ppm
    FROM c
    """,
)
def ev_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    for every (prev_type, next_type) pair, the transition count and
    the exact-ppm conditional probability — the behavioral-sequence
    feature table (and the bigram LM over event streams).  Scale
    shape: the lag window partitions by user_id — per-user history is
    the natural partition, no global order — and the matrix itself is
    |types|^2-bounded however large the event log, so the final
    normalizing window runs over a tiny relation.  Determinism under
    duplicate timestamps: the window orders by (ts, event_id), a total
    order, same as the gaps-and-islands queries."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    c = t.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    return c.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n)"
            " div (SUM(n) OVER (PARTITION BY prev_type)) AS BIGINT)"
        ).alias("prob_ppm"),
    )


@query(
    "ev_time_to_convert",
    tags=("events", "funnel", "sequence"),
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_view_us
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), b AS (
      SELECT e.user_id, fv.first_view_us,
             MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS first_buy_us
      FROM events e JOIN fv USING (user_id)
      WHERE e.event_type = 'purchase'
        AND epoch_us(CAST(ts AS TIMESTAMP)) > fv.first_view_us
      GROUP BY e.user_id, fv.first_view_us
    )
    SELECT user_id,
           CAST((first_buy_us - first_view_us) // 1000000 AS BIGINT)
             AS secs_to_convert
    FROM b
    """,
)
def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency per user: seconds from the first 'view' to the
    first purchase STRICTLY AFTER it — true sequence semantics, so a
    user who purchased both before and after their first view still
    converts (a single conditional-min over all purchases would
    compare against the pre-view purchase and silently drop them —
    the code-review catch this rewrite fixes).  Shape: one filtered
    min-agg for first views, one user-keyed join filtering purchases
    to t > first_view, one more min-agg — all map-side-partial
    aggregations and a user-keyed equality join, no window, no
    self-join over the raw log.  Users who never viewed or never
    purchased after viewing are absent.  Microsecond epochs subtract
    exactly; the seconds division truncates identically in both
    engines (non-negative by the filter)."""
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("first_view_us"))
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("buy_us")
    )
    b = (
        buys.join(fv, "user_id")
        .where(F.col("buy_us") > F.col("first_view_us"))
        .groupBy("user_id", "first_view_us")
        .agg(F.min("buy_us").alias("first_buy_us"))
    )
    return b.selectExpr(
        "user_id",
        "CAST((first_buy_us - first_view_us) div 1000000 AS BIGINT) AS secs_to_convert",
    )


@query(
    "ev_wau_mau_stickiness",
    tags=("events", "retention", "dataset-card"),
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), wk AS (
      SELECT date_trunc('week', ts) AS week_start,
             COUNT(DISTINCT user_id) AS wau
      FROM e GROUP BY 1
    ), mo AS (
      SELECT date_trunc('month', ts) AS month_start,
             COUNT(DISTINCT user_id) AS mau
      FROM e GROUP BY 1
    )
    SELECT wk.week_start,
           CAST(wk.wau AS BIGINT) AS wau,
           CAST(mo.mau AS BIGINT) AS mau,
           CAST((1000000::HUGEINT * wk.wau) // mo.mau AS BIGINT)
             AS stickiness_ppm
    FROM wk JOIN mo ON date_trunc('month', wk.week_start) = mo.month_start
    """,
)
def ev_wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly/monthly active users and the WAU/MAU stickiness ratio
    per week (exact ppm) — the engagement gauge every activity
    dashboard leads with.  Two exact distinct-count aggregations
    (each shuffles pre-deduplicated (period, user) pairs, partial
    map-side), then a join on the week's containing month: the joined
    relations are period-bounded (weeks, months), so the join is
    trivial at any event volume.  A week belongs to the month its
    FIRST DAY falls in — the deterministic convention both engines
    spell identically."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week_start")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    mo = ev.groupBy(F.date_trunc("month", F.col("ts")).alias("month_start")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        wk.join(
            mo,
            F.date_trunc("month", F.col("week_start")) == F.col("month_start"),
        )
        .select(
            "week_start",
            F.col("wau").cast("bigint").alias("wau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * wau) div mau AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
    )


@query(
    "ev_interarrival_histogram",
    tags=("events", "sequence", "corpus-stats"),
    oracle="""
    WITH o AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
      FROM events
    ), g AS (
      SELECT length(bin(gap_us // 1000)) - 1 AS bucket FROM o
      WHERE gap_us IS NOT NULL AND gap_us > 0
    )
    SELECT CAST(bucket AS BIGINT) AS log2_gap_ms,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST((1000000::HUGEINT * COUNT(*)) // SUM(COUNT(*)) OVER ()
                AS BIGINT) AS share_ppm
    FROM g GROUP BY 1
    """,
)
def ev_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution: per-user event gaps bucketed
    by power-of-two milliseconds — the latency/burstiness fingerprint
    that sizes session-gap thresholds and stream watermarks (the 30
    min session gap and the watermark horizon should both come from
    THIS histogram, not folklore).  The lag window partitions by user
    (never global), the histogram is <=64 rows, and the normalizing
    window runs over that bounded result.  Zero-gap pairs (identical
    microsecond timestamps) are excluded — log2 of 0 is undefined and
    both engines' ordering under exact ties is the (ts, event_id)
    total order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    g = o.groupBy(
        (F.length(F.bin(F.expr("gap_us div 1000"))) - 1)
        .cast("bigint")
        .alias("log2_gap_ms")
    ).agg(F.count(F.lit(1)).alias("n_gaps"))
    return g.select(
        "log2_gap_ms",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * n_gaps)"
            " div (SUM(n_gaps) OVER ()) AS BIGINT)"
        ).alias("share_ppm"),
    )


@query(
    "ev_dow_hour_heatmap",
    tags=("events", "window-agg", "dataset-card"),
    oracle="""
    SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def ev_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-of-week x hour-of-day activity heatmap (events and
    distinct users per cell) — the load-shape table capacity planning
    reads.  One aggregation, 168-cell-bounded output at any volume;
    the distinct count shuffles pre-deduplicated (cell, user) pairs.
    Day numbering: Spark's dayofweek is 1=Sunday..7; DuckDB's
    dayofweek is 0=Sunday..6, so the oracle adds 1 — pinned here so
    nobody 'fixes' the off-by-one into existence."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "ev_session_attribution",
    tags=("events", "sessionization", "attribution"),
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             value
      FROM events
    ), o AS (
      SELECT user_id, event_id, event_type, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl0 AS (
      SELECT user_id, event_id, event_type, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    ), isl AS (
      SELECT user_id, event_type, value, island,
             first_value(event_type) OVER (
               PARTITION BY user_id, island
               ORDER BY ts, event_id) AS first_touch
      FROM isl0
    ), sess AS (
      SELECT user_id, island,
             MIN(first_touch) AS first_touch,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS purchase_cents,
             COUNT(*) AS n_events
      FROM isl GROUP BY user_id, island
    )
    SELECT first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN purchase_cents > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converting,
           CAST(SUM(purchase_cents) AS BIGINT) AS attributed_cents,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM sess GROUP BY first_touch
    """,
)
def ev_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH revenue attribution — the marketing-analytics cube:
    sessionize each user's stream (same 30-min gaps-and-islands
    construction as ev_gaps_and_islands), credit every session's
    purchase value (exact cents) to the session's FIRST event type,
    and roll up per first-touch channel: sessions, converting
    sessions, attributed revenue, event volume.  Three window passes
    share ONE user-keyed shuffle+sort (lag flag, running island id,
    first_value within island — Catalyst reuses the exchange); the
    rollups are map-side-combined aggregates on (user, island) then
    the tiny channel key.  All integer; value-exact cross-engine."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= gap_us),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = (
        e.withColumn("is_new", is_new)
        .withColumn("island", F.sum("is_new").over(run).cast("long"))
        .withColumn(
            "first_touch",
            F.first("event_type").over(
                Window.partitionBy("user_id", "island").orderBy("ts", "event_id")
            ),
        )
    )
    sess = isl.groupBy("user_id", "island").agg(
        F.min("first_touch").alias("first_touch"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("purchase_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sess.groupBy("first_touch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("purchase_cents") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_converting"),
        F.sum("purchase_cents").cast("bigint").alias("attributed_cents"),
        F.sum("n_events").cast("bigint").alias("n_events"),
    )


@query(
    "ev_quota_admission",
    tags=("events", "curation", "streaming-equivalent", "scale-path"),
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(admit_rank AS BIGINT) AS admit_rank
    FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS admit_rank
      FROM events
    ) r WHERE admit_rank <= 7
    """,
)
def ev_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ADMISSION quota in arrival order — the oracle-checked
    batch twin of streaming/pipeline.quota_admit_stream (VERDICT r07
    #7): keep each user's first 7 events by (ts, event_id), with their
    admit rank, drop the rest.  The crawl-pipeline reading is a
    per-domain fetch budget enforced retroactively over a day's batch,
    exactly matching what the at-ingest stream admits (the
    batch==stream equivalence test pins the two outputs equal row for
    row).

    Scale shape: the keep decision reuses cap_per_domain's
    OVER-CAP-ONLY shuffle (operators/urls.py — the operator is
    key-agnostic; 'domain' is any key column): under-quota users pass
    through unshuffled via a broadcast anti-join against the
    cap-bounded violator list, and only over-quota users' rows pay a
    window sort.  The admit_rank window then runs on the KEPT relation
    only — at most `cap` rows per key by construction, so its
    per-group sort work is bounded however skewed the input.  The
    oracle affords the single global window at fixture scale."""
    from parquet_to_sql_spark.operators.urls import cap_per_domain

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    kept = cap_per_domain(e, "user_id", 7, [F.asc("ts"), F.asc("event_id")])
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return kept.withColumn(
        "admit_rank", F.row_number().over(w).cast("bigint")
    )


@query(
    "ev_user_paths_topk",
    tags=("events", "sequence", "scale-path"),
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
)
def ev_user_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the 20 most common 3-step event paths
    (consecutive event-type triples within a user's stream, total
    order (ts, event_id)) — the sequence-level counterpart of the
    pairwise transition matrix, and the standard input to funnel
    discovery (which 3-step journeys actually happen, vs the funnels
    we guessed).

    Scale shape: one user-keyed window exchange produces the triples
    via lead(1)/lead(2) (no self-joins — the naive formulation joins
    events to itself twice on adjacency); the path rollup is
    map-side-combined with cardinality bounded by |event types|^3
    regardless of corpus size, and the top-20 is a
    TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@query(
    "ev_funnel_unordered",
    tags=("events", "funnel", "set-semantics"),
    oracle="""
    WITH f AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view'
            THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS view_us,
        MIN(CASE WHEN event_type = 'click'
            THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS click_us,
        MIN(CASE WHEN event_type = 'purchase'
            THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS purchase_us
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY user_id
    )
    SELECT user_id, view_us, click_us, purchase_us,
           GREATEST(view_us, click_us, purchase_us) AS completed_us,
           CAST((GREATEST(view_us, click_us, purchase_us)
                 - LEAST(view_us, click_us, purchase_us)) // 60000000
                AS BIGINT) AS span_minutes,
           (GREATEST(view_us, click_us, purchase_us)
            - LEAST(view_us, click_us, purchase_us))
             <= 7 * 86400 * 1000000::BIGINT AS within_7d
    FROM f
    WHERE view_us IS NOT NULL AND click_us IS NOT NULL
      AND purchase_us IS NOT NULL
    """,
)
def ev_funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY-ORDER (set-semantics) funnel — the other funnel family
    real product analytics ships alongside the ordered one
    (ev_funnel_three_step): a user completes when they have done ALL
    of view/click/purchase in any order; the completion instant is
    the LAST first-occurrence, the span is last-minus-first, and the
    7-day flag marks completions inside the campaign window.
    Ordered funnels under-count users who purchase before clicking
    (impulse + research-later) — the unordered twin is how that gap
    is measured.

    Shape: ONE filtered scan, one user-keyed conditional-min
    aggregate (map-side partial; three MIN(CASE) columns — no joins,
    no window, no per-step self-join over the log), then row-local
    GREATEST/LEAST arithmetic.  Microsecond epochs subtract exactly;
    the minutes division truncates identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    f = (
        ev.where(
            F.col("event_type").isin("view", "click", "purchase")
        )
        .groupBy("user_id")
        .agg(
            *[
                F.min(
                    F.when(F.col("event_type") == t, us)
                ).alias(f"{t}_us")
                for t in ("view", "click", "purchase")
            ]
        )
        .where(
            F.col("view_us").isNotNull()
            & F.col("click_us").isNotNull()
            & F.col("purchase_us").isNotNull()
        )
    )
    hi = F.greatest("view_us", "click_us", "purchase_us")
    lo = F.least("view_us", "click_us", "purchase_us")
    return f.select(
        "user_id",
        "view_us",
        "click_us",
        "purchase_us",
        hi.alias("completed_us"),
        F.expr(
            "CAST((GREATEST(view_us, click_us, purchase_us)"
            " - LEAST(view_us, click_us, purchase_us)) DIV 60000000"
            " AS BIGINT)"
        ).alias("span_minutes"),
        ((hi - lo) <= F.lit(7 * 86400 * 1000000)).alias("within_7d"),
    )


@query(
    "ev_max_drawdown",
    tags=("events", "time-series", "window"),
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
             SUM(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS cum
      FROM events
    ), p AS (
      SELECT user_id, cum,
             MAX(cum) OVER (
               PARTITION BY user_id ORDER BY t, event_id
             ) AS peak
      FROM c
    )
    SELECT user_id,
           CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM p GROUP BY user_id
    """,
)
def ev_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN per user — the peak-to-trough metric
    (running cumulative value, its running maximum, and the largest
    peak-minus-current gap) every budget/anomaly dashboard computes
    over per-entity value streams; a spend stream's max drawdown is
    its worst cumulative slide between refills.  Exact integer
    cents; the running order is the total (ts, event_id) order, so
    ties cannot reorder across engines.

    Scale shape: one shuffle on user_id, two stacked running-window
    passes over the SAME sort (Spark evaluates both frames in one
    Window exec chain without re-sorting), one per-user final
    aggregate — no self-join, no collect."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).over(w).alias(
            "cum"
        ),
    )
    p = c.select(
        "user_id", "cum", F.max("cum").over(w).alias("peak")
    )
    return p.groupBy("user_id").agg(
        F.max(F.col("peak") - F.col("cum")).cast("bigint").alias(
            "max_drawdown_cents"
        ),
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )

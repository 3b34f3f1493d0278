"""Window-function coverage: ranking, analytic, and frame clauses.

Absent from the reference (SURVEY.md §2.B). Written via spark.sql with
SQL text shared verbatim with the DuckDB oracle where the dialects
agree — the window spec is identical ANSI SQL in both engines, so the
two sides cannot drift.

Every ORDER BY inside a window carries a unique tie-breaker column so
results are total-ordered and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query


from parquet_to_sql_spark.queries.relational import _sql  # shared — do not fork


_TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@query("window_topn_per_customer", tags=("window", "ranking"), oracle=_TOPN_SQL)
def window_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ROW_NUMBER — the scalable
    per-group top-k (one shuffle on the partition key; Spark pushes a
    per-partition rank limit before the final filter)."""
    return _sql(spark, sf_dir, _TOPN_SQL, ("orders",))


_RANKS_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
       NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
"""


@query("window_rank_dense_ntile", tags=("window", "ranking"), oracle=_RANKS_SQL)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE over segment partitions."""
    return _sql(spark, sf_dir, _RANKS_SQL, ("customer",))


_LAG_SQL_SPARK = """
SELECT event_id, user_id, value,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
"""
# The oracle casts ts to micros first: under a nanos-annotated
# fixture DuckDB would otherwise order at ns precision (never
# consulting the event_id tie-break) while Spark orders at truncated
# micros — the same hazard the events-module oracles guard against.
_LAG_SQL_ORACLE = _LAG_SQL_SPARK.replace(
    "FROM events",
    "FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts "
    "FROM events) t",
)


@query("window_lag_lead_events", tags=("window", "analytic"), oracle=_LAG_SQL_ORACLE)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD per user ordered by event time (IEEE subtraction of
    raw doubles is engine-deterministic)."""
    return _sql(spark, sf_dir, _LAG_SQL_SPARK, ("events",))


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


@query("window_running_sum", tags=("window", "frame"), oracle=_RUNNING_SQL)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer (ROWS UNBOUNDED PRECEDING frame),
    decimal-exact then cast to double."""
    return _sql(spark, sf_dir, _RUNNING_SQL, ("orders",))


_MOVING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_price,
       COUNT(*) OVER w AS n_in_window
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@query("window_moving_avg", tags=("window", "frame"), oracle=_MOVING_SQL)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average via a named WINDOW clause with a bounded
    ROWS frame (exact decimal sum / count)."""
    return _sql(spark, sf_dir, _MOVING_SQL, ("orders",))


_FIRST_LAST_SQL = """
SELECT DISTINCT o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
       LAST_VALUE(o_orderkey)  OVER w AS last_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice)  OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("window_first_last", tags=("window", "analytic"), oracle=_FIRST_LAST_SQL)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE with an explicit full-partition frame
    (the default frame would make LAST_VALUE the current row)."""
    return _sql(spark, sf_dir, _FIRST_LAST_SQL, ("orders",))


_PCT_SQL = """
SELECT c_custkey, c_mktsegment,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume,
       NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS second_richest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@query("window_pct_cume_nth", tags=("window", "ranking"), oracle=_PCT_SQL)
def window_pct_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST / NTH_VALUE (full-partition frame)."""
    return _sql(spark, sf_dir, _PCT_SQL, ("customer",))


_RANGE_SQL = """
SELECT o_orderkey, o_totalprice,
       COUNT(*) OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
         AS n_similar_priced
FROM orders
"""


@query("window_range_frame", tags=("window", "frame", "range"), oracle=_RANGE_SQL)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: peers within ±1000 of each order's price
    (value-based frame, not row-based)."""
    return _sql(spark, sf_dir, _RANGE_SQL, ("orders",))


_TIME_RANGE_BODY = """
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""

_TIME_RANGE_SPARK = f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       SUM(CAST(FLOOR(value * 64) AS BIGINT)) OVER w AS qsum_trailing_1h
{_TIME_RANGE_BODY}
"""

# identical query; the windowed SUM(BIGINT) is re-CAST because DuckDB
# widens it to HUGEINT (pandas float64, which str-renders differently)
_TIME_RANGE_DUCK = f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(FLOOR(value * 64) AS BIGINT)) OVER w AS BIGINT) AS qsum_trailing_1h
{_TIME_RANGE_BODY}
""".replace(
    "FROM events",
    "FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts "
    "FROM events) t",
)  # micros-cast so RANGE bounds match Spark under a nanos fixture


@query(
    "window_time_range_frame",
    tags=("window", "frame", "range", "event-time"),
    oracle=_TIME_RANGE_DUCK,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, activity in the trailing hour
    of each event (interval-bounded value frame over the timestamp
    ordering — the sliding-window-per-row shape; `window_range_frame`
    covers the numeric-bounds variant).  RANGE frames include peers,
    so duplicate timestamps don't need a tie-break to stay
    deterministic.  The double `value` is quantized floor(x*2^6) ->
    BIGINT before summing (exact, order-independent on both
    engines)."""
    return _sql(spark, sf_dir, _TIME_RANGE_SPARK, ("events",))


_IGNORE_NULLS_BODY = """
FROM (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) END AS v
  FROM events
) t
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

# Same semantics, dialect-split syntax: Spark puts IGNORE NULLS after
# the call, DuckDB 1.0 inside the argument list.
_IGNORE_NULLS_SPARK = f"""
SELECT event_id, user_id,
       LAG(v, 1) IGNORE NULLS OVER w AS prev_value,
       LAST_VALUE(v) IGNORE NULLS OVER wf AS last_seen_value
{_IGNORE_NULLS_BODY}
"""

_IGNORE_NULLS_DUCK = f"""
SELECT event_id, user_id,
       LAG(v, 1 IGNORE NULLS) OVER w AS prev_value,
       LAST_VALUE(v IGNORE NULLS) OVER wf AS last_seen_value
{_IGNORE_NULLS_BODY}
"""


@query(
    "window_ignore_nulls",
    tags=("window", "analytic", "ignore-nulls"),
    oracle=_IGNORE_NULLS_DUCK,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic functions: per user, the previous and the
    most recent non-null purchase value carried forward over a sparse
    column (nulls for non-purchase events) — the gap-filling /
    last-observation-carried-forward primitive. Unique (ts, event_id)
    tie-break keeps it total-ordered; only the IGNORE NULLS placement
    differs between the dialects."""
    return _sql(spark, sf_dir, _IGNORE_NULLS_SPARK, ("events",))


_RUNNING_MEDIAN_BODY = """
FROM (
  SELECT event_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
) t
"""


@query(
    "window_running_median",
    tags=("window", "robust-stats"),
    oracle=f"""
    SELECT event_id, user_id,
           quantile_cont(cents, 0.5) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS UNBOUNDED PRECEDING) AS running_median_cents
    {_RUNNING_MEDIAN_BODY.replace("ts,", "CAST(ts AS TIMESTAMP) AS ts,")}
    """,
)
def window_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running median of purchase value per user — an exact
    order-statistic as a window aggregate (Spark `percentile` /
    DuckDB `quantile_cont` share the (n-1)p interpolation, and cents
    are integers, so the halves interpolate bit-identically).  The
    window orders by (ts, event_id) for determinism under duplicate
    timestamps and stays hash-partitioned on user_id."""
    return _sql(
        spark,
        sf_dir,
        f"""
        SELECT event_id, user_id,
               percentile(cents, 0.5) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS running_median_cents
        {_RUNNING_MEDIAN_BODY}
        """,
        ("events",),
    )


@query(
    "window_running_distinct",
    tags=("window",),
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user — DISTINCT isn't
    allowed in window frames in either engine, so it decomposes into
    the standard exact rewrite: a first-occurrence flag (row_number
    over the (user, type) key) followed by a running sum.  Both
    windows shuffle on the same user_id key (the type ranking
    partitions by a superset key, so no extra exchange at scale)."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH flagged AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                      THEN 1 ELSE 0 END AS first_seen
          FROM events
        )
        SELECT event_id, user_id,
               CAST(SUM(first_seen) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
        FROM flagged
        """,
        ("events",),
    )


@query(
    "window_pareto_abc",
    tags=("window", "scale-path", "aggregation"),
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS cents
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, cents,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents,
             CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
      FROM rev
    )
    SELECT l_partkey, cents, cum_cents,
           CASE WHEN cum_cents::HUGEINT * 100 <= 80 * total_cents::HUGEINT THEN 'A'
                WHEN cum_cents::HUGEINT * 100 <= 95 * total_cents::HUGEINT THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def window_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC revenue classification — a GLOBAL revenue-ranked
    running sum computed WITHOUT a global sort: parts are bucketed by
    the highest set bit of their revenue (every value in a higher
    band outranks every value in a lower one), the within-band running
    sum is a window hash-partitioned on the band, and each band adds
    an exclusive prefix of the higher bands' totals — a table bounded
    by ~64 rows however large the input (the same prefix-sum
    decomposition as the sweep-line peak-concurrency query, applied to
    a value-ranked axis).  The oracle affords the single global
    window; orderings are identical (cents DESC, partkey), so the
    decomposed cumulative matches exactly.  ABC thresholds are
    cross-multiplied integer comparisons."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)"
        ).alias("cents")
    ).withColumn("_band", F.length(F.expr("bin(cents)")))
    in_band = Window.partitionBy("_band").orderBy(
        F.desc("cents"), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded = rev.withColumn("_cum_in", F.sum("cents").over(in_band))
    totals = rev.groupBy("_band").agg(F.sum("cents").alias("_bt"))
    higher = (
        Window.orderBy(F.desc("_band"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_band",
        F.coalesce(F.sum("_bt").over(higher), F.lit(0)).alias("_off"),
        F.sum("_bt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    out = banded.join(F.broadcast(offsets), "_band").select(
        "l_partkey",
        "cents",
        (F.col("_off") + F.col("_cum_in")).alias("cum_cents"),
        # comparison widened to DECIMAL: cum*100 passes int64 around
        # 3 TB of revenue — far below this query's design point
        F.when(
            (F.col("_off") + F.col("_cum_in")).cast("decimal(38,0)") * 100
            <= 80 * F.col("_total").cast("decimal(38,0)"),
            "A",
        )
        .when(
            (F.col("_off") + F.col("_cum_in")).cast("decimal(38,0)") * 100
            <= 95 * F.col("_total").cast("decimal(38,0)"),
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    return out


@query(
    "window_global_prefix_sum",
    headline=True,
    tags=("window", "scale-path", "prefix-sum"),
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS running_cents
    FROM orders
    """,
)
def window_global_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL running revenue (integer cents) over the full orders
    table — semantically ``SUM(x) OVER (ORDER BY o_orderkey)`` with no
    PARTITION BY, but computed by the DISTRIBUTED two-level prefix sum
    (operators.prefix.prefix_sum: range partition, in-partition
    window, O(#partitions) offset collect) instead of Spark's
    single-task unpartitioned window.  At 100 TB the unpartitioned
    formulation moves the whole table to one task; this one never
    holds more than a partition anywhere.  The oracle IS the
    unpartitioned spelling — exact equality is the point."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.prefix import prefix_sum

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("_cents"),
    )
    return prefix_sum(orders, ["o_orderkey"], "_cents", out_col="running_cents").select(
        "o_orderkey", "running_cents"
    )


@query(
    "window_grouped_prefix_sum",
    tags=("window", "scale-path", "prefix-sum"),
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  OVER (PARTITION BY o_custkey % 8
                        ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS running_cents
    FROM orders
    """,
)
def window_grouped_prefix_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP running revenue over 8 deliberately HUGE groups
    (custkey % 8 — each holds 1/8 of all orders), semantically
    ``SUM(x) OVER (PARTITION BY g ORDER BY k)``, computed by the
    grouped two-level prefix sum (operators.prefix.grouped_prefix_sum)
    instead of the plain window.  The plain window puts each group in
    ONE task — fine for many small groups, fatal when a group is
    corpus-sized or skew-hot; the grouped scan range-partitions on
    (group, key), windows inside each partition, and chains the
    cross-partition offsets with a window over the tiny
    (partition x group) totals relation — NO driver collect, bounded
    work per task for any group size or count.  The oracle IS the
    plain-window spelling — exact equality is the point."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.prefix import grouped_prefix_sum

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"),
        F.col("o_orderkey"),
        (F.col("o_custkey") % 8).alias("_g"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("_cents"),
    )
    return grouped_prefix_sum(
        orders, ["_g"], ["o_orderkey"], "_cents", out_col="running_cents"
    ).select("o_custkey", "o_orderkey", "running_cents")


@query(
    "window_grouped_pareto_abc",
    tags=("window", "scale-path", "prefix-sum", "aggregation"),
    oracle="""
    WITH rev AS (
      SELECT n_name, c_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, c_custkey
    ), ranked AS (
      SELECT n_name, c_custkey, cents,
             CAST(SUM(cents) OVER (PARTITION BY n_name
                                   ORDER BY cents DESC, c_custkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_cents,
             CAST(SUM(cents) OVER (PARTITION BY n_name) AS BIGINT)
               AS nation_cents
      FROM rev
    )
    SELECT n_name, c_custkey, cents, cum_cents,
           CASE WHEN cum_cents::HUGEINT * 100 <= 80 * nation_cents::HUGEINT
                THEN 'A'
                WHEN cum_cents::HUGEINT * 100 <= 95 * nation_cents::HUGEINT
                THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def window_grouped_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP Pareto/ABC classification — customers ranked by
    revenue within their nation, cumulative revenue share, 80/95 ABC
    classes.  The grouped-prefix-sum consumer shape VERDICT r07 #7
    called out as uncovered: window_pareto_abc decomposes ONE global
    revenue-ranked running sum; here every nation needs its own, and
    a single hot nation is the unpartitioned-window trap all over
    again.  operators.prefix.grouped_prefix_sum handles it with NO
    driver collect at any group count: range-partition on
    (nation, -cents, custkey), per-(partition, nation) totals, the
    cross-partition offsets an ordinary window over that tiny
    relation, broadcast back.  Descending revenue order rides the
    ascending operator via the negated-cents column.  Nation totals
    are the running sum's own per-group MAX (cents > 0), a
    group-cardinality aggregate broadcast back — no second scan of
    the join lineage.  ABC thresholds are cross-multiplied integer
    comparisons, exact in both engines; the oracle affords the plain
    per-nation window at fixture scale."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.prefix import grouped_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)"
            ).alias("cents")
        )
        .withColumn("_negcents", -F.col("cents"))
    )
    cum = grouped_prefix_sum(
        rev, ["n_name"], ["_negcents", "c_custkey"], "cents", "cum_cents"
    )
    totals = cum.groupBy("n_name").agg(
        F.max("cum_cents").alias("nation_cents")
    )
    cum_d = F.col("cum_cents").cast("decimal(38,0)")
    tot_d = F.col("nation_cents").cast("decimal(38,0)")
    return (
        cum.join(F.broadcast(totals), "n_name")
        .select(
            "n_name",
            "c_custkey",
            "cents",
            "cum_cents",
            F.when(cum_d * 100 <= 80 * tot_d, "A")
            .when(cum_d * 100 <= 95 * tot_d, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )

"""Remaining function-surface coverage: positional explode, map-typed
expressions, TRY_CAST error-safe semantics, epoch conversions."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query
from parquet_to_sql_spark.queries.text import DUCK_WORDS


@query(
    "fn_posexplode_words",
    tags=("functions", "explode", "ordinality"),
    oracle=f"""
    SELECT doc_id, u.pos AS pos, u.word AS word FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len({DUCK_WORDS})+1),
                    i -> struct_pack(pos := i, word := {DUCK_WORDS}[i]))) AS u
      FROM documents
      WHERE doc_id < 20
    ) t
    """,
)
def fn_posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (1-based ordinality) of document tokens."""
    from parquet_to_sql_spark.operators.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(ws_tokens(F.col("text"))).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "fn_map_expressions",
    tags=("functions", "map"),
    oracle="""
    SELECT event_id,
           map(['type','band'],
               [event_type, CASE WHEN value >= 100 THEN 'high' ELSE 'low' END]
              )['type'][1] AS type_from_map,
           2 AS n_keys
    FROM events
    """,
)
def fn_map_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed expressions: build a map column, extract by key,
    count keys (scalar outputs so both engines compare exactly)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("band"), F.when(F.col("value") >= 100, "high").otherwise("low"),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "fn_try_cast",
    tags=("functions", "error-safe"),
    oracle="""
    SELECT p_partkey,
           TRY_CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           TRY_CAST(p_type AS BIGINT) AS type_as_num,
           TRY_CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS size_roundtrip
    FROM part
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST error-safe conversions: malformed input -> NULL, never
    a task failure (the ANSI-safe semantics for dirty data at scale)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "([0-9]+)", 1).try_cast("bigint").alias("brand_num"),
        F.col("p_type").try_cast("bigint").alias("type_as_num"),
        F.col("p_size").cast("string").try_cast("bigint").alias("size_roundtrip"),
    )


@query(
    "fn_epoch_seconds",
    tags=("functions", "date"),
    oracle="""
    SELECT event_id,
           CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           to_timestamp(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
             AT TIME ZONE 'UTC' AS back_to_ts
    FROM events
    """,
)
def fn_epoch_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch round-trip: timestamp -> unix seconds (truncating) ->
    timestamp."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("back_to_ts"),
    )


@query(
    "sort_nulls_explicit",
    tags=("sort", "null-ordering"),
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           o_totalprice
    FROM orders
    ORDER BY status_or_null ASC NULLS LAST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def sort_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering with tie-breaks. Spark defaults to
    nulls-first on ASC while DuckDB defaults to nulls-last — any
    nullable sort key in a LIMIT query MUST pin null placement
    explicitly, or the two engines return different row sets."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_last(),
            F.desc("o_totalprice"),
            "o_orderkey",
        )
        .limit(50)
    )


@query(
    "profile_orders_columns",
    tags=("profiling", "statistics"),
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(COUNT(o_orderkey) AS BIGINT)       AS orderkey_nonnull,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
      CAST(MIN(o_totalprice) AS DOUBLE)       AS price_min,
      CAST(MAX(o_totalprice) AS DOUBLE)       AS price_max,
      MIN(o_orderdate)                        AS date_min,
      MAX(o_orderdate)                        AS date_max,
      CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_cardinality,
      CAST(MIN(LENGTH(o_orderpriority)) AS INT) AS prio_minlen,
      CAST(MAX(LENGTH(o_orderpriority)) AS INT) AS prio_maxlen
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (the data-quality primitive every
    ingest pipeline runs first): counts, null counts, distincts,
    min/max per column — a single aggregate, no per-column passes."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("orderkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.min("o_totalprice").cast("double").alias("price_min"),
        F.max("o_totalprice").cast("double").alias("price_max"),
        F.min("o_orderdate").alias("date_min"),
        F.max("o_orderdate").alias("date_max"),
        F.countDistinct("o_orderstatus").alias("status_cardinality"),
        F.min(F.length("o_orderpriority")).alias("prio_minlen"),
        F.max(F.length("o_orderpriority")).alias("prio_maxlen"),
    )


@query(
    "fn_regexp_replace_backref",
    tags=("functions", "regex"),
    oracle=r"""
    SELECT p_partkey,
           regexp_replace(p_brand, 'Brand#([0-9]+)', 'B-\1') AS brand_short,
           regexp_replace(p_name, '[aeiou]', '', 'g')        AS name_novowels
    FROM part
    """,
)
def fn_regexp_replace_backref(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""regexp_replace with a capture-group backreference (Spark uses
    $1, DuckDB \1 — same semantics, dialect-specific syntax) and a
    global character-class strip."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_brand", r"Brand#([0-9]+)", r"B-$1").alias("brand_short"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
    )


@query(
    "fn_from_json_struct",
    tags=("functions", "json"),
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL)
             AS parse_ok
    FROM events
    """,
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct then field access (schema-on-read
    JSON parsing, vs the string-path get_json_object in
    fn_json_events)."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        parsed.getField("k").isNotNull().alias("parse_ok"),
    )


@query(
    "fn_interval_arithmetic",
    tags=("functions", "datetime", "interval"),
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 3 DAY AS due_ts,
           CAST(o_orderdate AS TIMESTAMP) - INTERVAL 90 MINUTE AS cutoff_ts,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 2 MONTH AS review_ts,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                AS INTEGER) AS days_to_98,
           CAST(o_orderdate AS TIMESTAMP)
             + to_days(CAST(o_custkey % 30 AS INTEGER)) AS staggered_ts
    FROM orders
    """,
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: timestamp +/- day/minute/month
    intervals, day differences against a fixed date, and a
    column-driven (make_interval-style) dynamic day offset. Calendar
    month addition is end-of-month clamped identically in both engines;
    outputs stay TIMESTAMP-typed (never DATE — pandas rendering of
    DATE differs between engines)."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        (ts + F.expr("INTERVAL 3 DAY")).alias("due_ts"),
        (ts - F.expr("INTERVAL 90 MINUTE")).alias("cutoff_ts"),
        (ts + F.expr("INTERVAL 2 MONTH")).alias("review_ts"),
        F.datediff(F.lit("1998-01-01").cast("date"), ts.cast("date")).alias(
            "days_to_98"
        ),
        (
            ts
            + F.make_interval(days=(F.col("o_custkey") % F.lit(30)).cast("int"))
        ).alias("staggered_ts"),
    )


@query(
    "fn_try_arithmetic",
    tags=("functions", "ansi", "error-handling"),
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_extendedprice / (l_linenumber - 1) AS DOUBLE)
           END AS price_per_extra_line,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(CAST(l_quantity AS BIGINT) % (l_linenumber - 1) AS BIGINT)
           END AS qty_mod,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           CASE WHEN l_linenumber <= 3 THEN CAST(l_linenumber AS BIGINT)
                ELSE NULL END AS small_line
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-mode discipline beyond try_cast: the engine runs with
    spark.sql.ansi.enabled=true (Spark 4 default), where 1/0 and bad
    casts RAISE — so every fallible expression in user queries uses the
    try_* family, which yields NULL instead. The oracle mirrors each
    NULL-producing condition with explicit CASE guards.
    tests/test_edges.py pins the raise-vs-null contrast."""
    li = load_table(spark, sf_dir, "lineitem")
    denom = F.col("l_linenumber") - F.lit(1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), denom)
        .cast("double")
        .alias("price_per_extra_line"),
        F.try_mod(F.col("l_quantity").cast("bigint"), denom)
        .cast("bigint")
        .alias("qty_mod"),
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.try_element_at(
            F.array(F.lit(1), F.lit(2), F.lit(3)).cast("array<bigint>"),
            F.col("l_linenumber").cast("int"),
        ).alias("small_line"),
    )


@query(
    "fn_bitwise",
    tags=("functions", "bitwise"),
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey & 255 AS BIGINT)  AS low_byte,
           CAST(p_partkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(p_partkey, p_size) AS BIGINT) AS mixed,
           CAST(p_size << 3 AS BIGINT)      AS size_x8,
           CAST(p_partkey >> 4 AS BIGINT)   AS bucket16
    FROM part
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family (& | xor << >>) — integer-exact on both
    engines; the building blocks the engine's own simhash/banding
    machinery uses, exposed as user-level functions."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("p_partkey & 255").cast("bigint").alias("low_byte"),
        F.expr("p_partkey | 4096").cast("bigint").alias("with_flag"),
        F.expr("p_partkey ^ p_size").cast("bigint").alias("mixed"),
        F.expr("shiftleft(p_size, 3)").cast("bigint").alias("size_x8"),
        F.expr("shiftright(p_partkey, 4)").cast("bigint").alias("bucket16"),
    )


@query(
    "fn_edit_distance",
    tags=("functions", "string", "fuzzy"),
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS INTEGER) AS name_type_dist,
           CAST(levenshtein(p_brand, 'BRAND_1') AS INTEGER) AS brand_dist
    FROM part
    """,
)
def fn_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance (integer-exact cross-engine) — the
    scalar companion to the set-based near-dup operators: cheap fuzzy
    key matching without any candidate machinery."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.col("p_type")).cast("int").alias(
            "name_type_dist"
        ),
        F.levenshtein(F.col("p_brand"), F.lit("BRAND_1")).cast("int").alias(
            "brand_dist"
        ),
    )


@query(
    "fn_inline_generators",
    tags=("functions", "generator", "explode-outer"),
    oracle="""
    WITH m AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS size_v,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ), e AS (
      SELECT p_partkey, 'size' AS metric, size_v AS val
      FROM m WHERE size_v > 25
      UNION ALL
      SELECT p_partkey, 'retail_cents' AS metric, cents AS val
      FROM m WHERE cents > 150000
    )
    SELECT m.p_partkey, e.metric, e.val
    FROM m LEFT JOIN e ON m.p_partkey = e.p_partkey
    """,
)
def fn_inline_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-function surface: build an array of (metric, val)
    structs per part, filter it with a higher-order lambda, and expand
    with inline_outer — the OUTER variant keeps parts whose array
    filtered to empty as a single null row (the unpivot-with-
    provenance shape; plain inline would silently drop them).  All
    generators run map-side in whole-stage codegen; the oracle is the
    equivalent UNION ALL + left join."""
    part = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    entries = F.filter(
        F.array(
            F.struct(
                F.lit("size").alias("metric"),
                F.col("p_size").cast("long").alias("val"),
            ),
            F.struct(F.lit("retail_cents").alias("metric"), cents.alias("val")),
        ),
        lambda v: ((v.metric == "size") & (v.val > 25))
        | ((v.metric == "retail_cents") & (v.val > 150000)),
    )
    return part.select("p_partkey", entries.alias("e")).select(
        "p_partkey", F.inline_outer("e")
    )


@query(
    "fn_collated_match",
    tags=("functions", "collation", "spark4"),
    oracle="""
    WITH dims AS (SELECT DISTINCT upper(c_mktsegment) AS seg_uc FROM customer)
    SELECT d.seg_uc,
           COUNT(*) AS n_customers,
           CAST(MIN(c.c_custkey) AS BIGINT) AS min_custkey
    FROM dims d
    JOIN customer c ON lower(c.c_mktsegment) = lower(d.seg_uc)
    GROUP BY d.seg_uc
    """,
)
def fn_collated_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware matching (Spark 4 COLLATE surface): an
    UPPERCASED dimension of segment names joins back to the
    mixed-case fact column under UTF8_LCASE collation — the
    case-insensitive-join shape without wrapping both sides in
    lower() by hand.  The oracle IS the lower()-join rewrite, which
    is exactly equivalent for ASCII; aggregates (count, min key) are
    integer-exact.  Collated comparisons stay JVM-side expressions,
    so the join is still a plain shuffled equi-join on the collated
    key at scale."""
    from parquet_to_sql_spark.queries.relational import _sql

    return _sql(
        spark,
        sf_dir,
        """
        WITH dims AS (SELECT DISTINCT upper(c_mktsegment) AS seg_uc FROM customer)
        SELECT d.seg_uc,
               COUNT(*) AS n_customers,
               MIN(c.c_custkey) AS min_custkey
        FROM dims d
        JOIN customer c
          ON collate(c.c_mktsegment, 'UTF8_LCASE') = collate(d.seg_uc, 'UTF8_LCASE')
        GROUP BY d.seg_uc
        """,
        ("customer",),
    )


@query(
    "profile_gini_concentration",
    tags=("profiling", "statistics", "exact-integer", "llm-pipeline"),
    oracle="""
    WITH counts AS (
      SELECT 'lang' AS col, lang AS val, COUNT(*) AS cnt
      FROM documents GROUP BY lang
      UNION ALL
      SELECT 'source', source, COUNT(*) FROM documents GROUP BY source
    ),
    per_col AS (
      SELECT col,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
      FROM counts GROUP BY col
    )
    SELECT col, n, n_values,
           (((n*n - sum_sq) * 1000) // (n*n)) * 1000
             + ((((n*n - sum_sq) * 1000) % (n*n)) * 1000) // (n*n)
           AS gini_ppm
    FROM per_col
    """,
)
def profile_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical concentration profile via GINI IMPURITY in exact
    parts-per-million — the diversity/skew metric data cards report,
    computed without entropy's log (whose libm rounding differs
    between engines and breaks value-exact comparison):
    gini = 1 - sum((cnt/n)^2) = (n^2 - sum(cnt^2)) / n^2, all integer
    throughout: the ppm scaling runs as TWO x1000 integer-division
    stages — with X = n^2 - sum_sq and D = n^2,
    floor(1e6*X/D) = floor(1e3*X/D)*1e3 + floor((1e3*X mod D)*1e3/D),
    exact by Euclidean division, and every intermediate stays <=
    D*1000 — so the overflow budget is D*1000 < 2^63, i.e.
    n <= ~9.6e7 rows per profiled column (a single x1e6 multiply
    would cap out at n ~= 3.0e6 — ADVICE r05; larger corpora rescale
    over per-shard profiles).  0 ppm = one value dominates entirely;
    higher = more uniform.  Integer division is Spark ``div`` /
    DuckDB ``//`` — both exact int64, no double rounding."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE scan for every profiled column: unpivot via a struct-array
    # explode, then a single (col, val) aggregate — at scale this
    # halves the table reads vs a per-column union of scans
    pairs = docs.select(
        F.explode(
            F.array(
                F.struct(F.lit("lang").alias("col"), F.col("lang").alias("val")),
                F.struct(F.lit("source").alias("col"), F.col("source").alias("val")),
            )
        ).alias("cv")
    )
    counts = pairs.groupBy(
        F.col("cv.col").alias("col"), F.col("cv.val").alias("val")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_col = counts.groupBy("col").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_sq"),
    )
    gini = (
        "(((n*n - sum_sq) * 1000) div (n*n)) * 1000"
        " + ((((n*n - sum_sq) * 1000) % (n*n)) * 1000) div (n*n)"
    )
    return per_col.select("col", "n", "n_values", F.expr(gini).alias("gini_ppm"))

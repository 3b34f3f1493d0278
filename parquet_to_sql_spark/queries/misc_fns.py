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

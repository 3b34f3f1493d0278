"""Scalar-function coverage: string / date / math / JSON / array /
conditional expressions.

The reference's entire scalar library is six value conversions
(/root/reference/src/ParquetImporter.php:151-202); the rebuild exposes
the full pyspark.sql.functions surface. Each query exercises a family
JVM-side (whole-stage codegen — no Python UDFs in any of these).

Functions whose last-ulp behavior differs across libm implementations
(ln, exp, pow) are kept out of oracle-compared outputs; sqrt and
arithmetic are IEEE-defined and safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query


@query(
    "fn_string_part",
    tags=("functions", "string"),
    oracle="""
    SELECT p_partkey,
           UPPER(p_type)                                   AS type_upper,
           LOWER(p_brand)                                  AS brand_lower,
           SUBSTRING(p_name, 1, 12)                        AS name_prefix,
           CAST(LENGTH(p_name) AS BIGINT)                  AS name_len,
           CONCAT(p_brand, '/', p_type)                    AS brand_type,
           REPLACE(p_brand, 'Brand#', 'B')                 AS brand_short,
           CAST(REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           TRIM(CONCAT(' ', p_name, ' '))                  AS name_trimmed
    FROM part
    """,
)
def fn_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).cast("long").alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
    )


@query(
    "fn_date_orders",
    tags=("functions", "date"),
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)    AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)    AS order_month,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)    AS order_day,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT)  AS order_quarter,
           DATE_TRUNC('month', o_orderdate)                AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
                                                           AS days_since_epoch_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def fn_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        # cast: DATE-typed outputs render differently in the two engines'
        # pandas bridges; timestamps compare identically
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@query(
    "fn_math_customer",
    tags=("functions", "math"),
    oracle="""
    SELECT c_custkey,
           ABS(c_acctbal)                       AS abs_bal,
           ROUND(c_acctbal)                     AS round_bal,
           FLOOR(c_acctbal)                     AS floor_bal,
           CEIL(c_acctbal)                      AS ceil_bal,
           CAST(SIGN(c_acctbal) AS INT)         AS sign_bal,
           SQRT(ABS(c_acctbal))                 AS sqrt_bal,
           c_acctbal * c_acctbal                AS bal_squared,
           CAST(c_custkey % 7 AS BIGINT)        AS bucket
    FROM customer
    """,
)
def fn_math_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (IEEE-deterministic subset)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.round("c_acctbal").alias("round_bal"),
        F.floor("c_acctbal").cast("double").alias("floor_bal"),
        F.ceil("c_acctbal").cast("double").alias("ceil_bal"),
        # int cast: DuckDB SIGN yields tinyint, Spark signum a double
        F.signum("c_acctbal").cast("int").alias("sign_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_bal"),
        (F.col("c_acctbal") * F.col("c_acctbal")).alias("bal_squared"),
        (F.col("c_custkey") % 7).alias("bucket"),
    )


@query(
    "fn_json_events",
    tags=("functions", "json"),
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def fn_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "fn_array_documents",
    tags=("functions", "array"),
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(string_split(text, ' ')) AS INT)                AS n_words,
           CAST(LENGTH(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words,
           string_split(text, ' ')[1]                                  AS first_word,
           CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                                                                       AS first3_sorted
    FROM documents
    """,
)
def fn_array_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: split/size/distinct/contains/sort/slice/join,
    all JVM-side higher-order operations (no UDF)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(words)), 1, 3), ",").alias(
            "first3_sorted"
        ),
    )


@query(
    "fn_conditional",
    tags=("functions", "conditional"),
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
                WHEN o_totalprice >= 150000 THEN 'large'
                WHEN o_totalprice >=  50000 THEN 'medium'
                ELSE 'small' END                          AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')   AS status_label,
           GREATEST(o_totalprice, 100000.0)               AS floor_100k,
           LEAST(o_totalprice, 100000.0)                  AS cap_100k,
           (o_orderstatus = 'F' AND o_totalprice > 200000) AS is_big_final
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/GREATEST/LEAST/boolean expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("cap_100k"),
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)).alias(
            "is_big_final"
        ),
    )


@query(
    "fn_variant_json",
    tags=("functions", "json", "variant", "spark4"),
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_value,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_value,
           CAST(json(props) AS VARCHAR)                       AS canonical_json,
           (json_type(json(props)) = 'NULL')                  AS is_json_null
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type surface: parse_json into a variant,
    typed variant_get extraction, try_variant_get on a missing path
    (null, no error), canonical re-serialization via to_json, and
    is_variant_null.  Variant is the semi-structured scale path —
    parsed once at ingest, binary-encoded, fields extracted without
    re-tokenizing the JSON text per query."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_value"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_value"),
        F.to_json(v).alias("canonical_json"),
        F.is_variant_null(v).alias("is_json_null"),
    )


@query(
    "fn_xml_roundtrip",
    tags=("functions", "xml", "spark4"),
    oracle="""
    SELECT o_orderkey,
           o_orderkey    AS xml_key,
           o_orderstatus AS xml_status,
           o_orderkey    AS xpath_key
    FROM orders
    """,
)
def fn_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (built-in since Spark 4): encode each order as an
    XML fragment, parse it back with from_xml (typed struct) and with
    an xpath expression.  The oracle is the identity projection —
    encode->parse->extract must reproduce the source columns exactly."""
    o = load_table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</k><s>"),
        F.col("o_orderstatus"),
        F.lit("</s></o>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, s STRING")
    return o.select(
        "o_orderkey",
        parsed.getField("k").alias("xml_key"),
        parsed.getField("s").alias("xml_status"),
        F.xpath_long(xml, F.lit("/o/k/text()")).alias("xpath_key"),
    )


def _duck_zorder(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _duck_scale(col: str, tbl: str, bits: int = 16) -> str:
    m = (1 << bits) - 1
    return (
        f"CAST(floor((CAST({col} - (SELECT MIN({col}) FROM {tbl}) AS DOUBLE))"
        f" * {m}.0 / (CAST((SELECT MAX({col}) FROM {tbl}) - (SELECT MIN({col}) FROM {tbl}) AS DOUBLE)))"
        f" AS BIGINT)"
    )


@query(
    "fn_zorder_key",
    tags=("functions", "layout", "zorder", "scale-path"),
    oracle=f"""
    WITH scaled AS (
      SELECT o_orderkey, o_custkey,
             {_duck_scale("o_custkey", "orders")} AS cn,
             {_duck_scale("o_orderkey", "orders")} AS kn
      FROM orders
    )
    SELECT o_orderkey, o_custkey, {_duck_zorder("cn", "kn")} AS zkey
    FROM scaled
    """,
)
def fn_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key over (custkey, orderkey): each dimension
    min/max-normalized onto 16 bits (a broadcast 1-row aggregate — the
    same pre-pass public OPTIMIZE ZORDER implementations do; without
    it the wider-ranged column owns all high bits and the key
    degenerates to a single-column sort), then bit-interleaved as
    pure JVM Column arithmetic.  Feed the key to
    plans.layout.write_range_clustered for two-dimensional file-level
    min/max pruning; the layout effect is asserted in
    tests/test_layout.py."""
    from parquet_to_sql_spark.plans.layout import scale_to_bits, zorder_key

    o = load_table(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min("o_orderkey").alias("k_lo"),
        F.max("o_orderkey").alias("k_hi"),
    )
    cn = scale_to_bits(F.col("o_custkey"), F.col("c_lo"), F.col("c_hi"))
    kn = scale_to_bits(F.col("o_orderkey"), F.col("k_lo"), F.col("k_hi"))
    return o.crossJoin(F.broadcast(rng)).select(
        "o_orderkey",
        "o_custkey",
        zorder_key(cn, kn).alias("zkey"),
    )


@query(
    "fn_url_parse",
    tags=("functions", "url"),
    oracle="""
    SELECT doc_id,
           'example.com' AS host,
           '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
           'k=' || CAST(n_chars AS VARCHAR) AS query,
           CAST(n_chars AS VARCHAR) AS k_param,
           replace(substr(text, 1, 20), ' ', '+') AS encoded_prefix
    FROM documents
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function surface: build a URL from columns, then parse_url
    back out HOST / PATH / QUERY / a single query parameter, plus
    url_encode of a text prefix.  The oracle is the identity
    reconstruction from the source columns (encode is exact because
    fixture text is [a-z ] only, where url-encoding == space->'+')."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?k="),
        F.col("n_chars").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("k")).alias("k_param"),
        F.url_encode(F.substring("text", 1, 20)).alias("encoded_prefix"),
    )


@query(
    "agg_price_histogram",
    tags=("aggregation", "histogram", "profiling"),
    oracle="""
    SELECT CAST(least(floor((o_totalprice - 0.0) * 12.0 / 600000.0), 11) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
    FROM orders
    GROUP BY bucket
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (12 buckets over
    [0, 600k)) — the data-profiling primitive, computed with explicit
    floor arithmetic identical in both engines (built-in width_bucket
    implementations may round differently; this formula is pinned
    IEEE-exact).  One partial-aggregated groupBy on a 12-value key."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.lit(0.0)) * F.lit(12.0) / F.lit(600000.0)),
        F.lit(11),
    ).cast("int")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("bucket_total"),
        )
    )


@query(
    "fn_higher_order_arrays",
    tags=("functions", "array", "higher-order"),
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
    )
    SELECT doc_id,
           list_bool_or(list_transform(words, x -> length(x) > 6))  AS has_long_word,
           list_bool_and(list_transform(words, x -> length(x) > 0)) AS all_nonempty,
           CAST(len(list_filter(words, x -> length(x) > 4)) AS INT) AS n_longish,
           CAST(list_reduce(list_transform(words, x -> CAST(length(x) AS BIGINT)),
                            (a, b) -> a + b) AS BIGINT)             AS total_chars,
           CAST(list_reduce(list_transform(range(1, len(words) + 1),
                                           i -> CAST(length(words[i]) * i AS BIGINT)),
                            (a, b) -> a + b) AS BIGINT)             AS pos_weighted_len,
           array_to_string(list_transform(words[1:3], x -> upper(x)), '-') AS first3_upper
    FROM w
    """,
)
def fn_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions end to end — exists / forall /
    filter / aggregate / zip_with / transform+slice — all JVM lambda
    expressions (no Python), the idiomatic replacement for per-row
    UDF loops over array columns at scale."""
    from parquet_to_sql_spark.operators.text import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    words = ws_tokens(F.col("text"))
    staged = docs.select("doc_id", words.alias("w"))
    wcol = F.col("w")
    return staged.select(
        "doc_id",
        F.exists(wcol, lambda x: F.length(x) > 6).alias("has_long_word"),
        F.forall(wcol, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.size(F.filter(wcol, lambda x: F.length(x) > 4)).alias("n_longish"),
        F.aggregate(
            wcol, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_chars"),
        F.aggregate(
            F.zip_with(
                wcol,
                F.sequence(F.lit(1), F.size(wcol)),
                lambda x, i: F.length(x).cast("long") * i.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("pos_weighted_len"),
        F.concat_ws("-", F.transform(F.slice(wcol, 1, 3), F.upper)).alias(
            "first3_upper"
        ),
    )

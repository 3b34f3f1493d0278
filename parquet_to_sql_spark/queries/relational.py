"""Core relational queries: filter -> groupBy -> aggregate family.

The reference has no query layer at all (SURVEY.md §2.B: filters,
aggregations absent — /root/reference/src/ParquetImporter.php contains
only TRUNCATE and statement_timeout SQL). These queries define the
rebuild's aggregation surface, all expressed declaratively so Catalyst
pushes filters into the Parquet scan and plans partial/final
aggregation automatically.

Float discipline: see queries/registry.py docstring. Money columns are
exact 2-decimal values stored as double, so DECIMAL(12,2)/DECIMAL(3,2)
casts are lossless and make SUMs engine-order-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query

# Shared exact-arithmetic fragments (identical text works in Spark SQL
# and DuckDB, so the two sides cannot drift).
DQ = "CAST(l_quantity AS DECIMAL(12,2))"
DP = "CAST(l_extendedprice AS DECIMAL(12,2))"
DD = "CAST(l_discount AS DECIMAL(3,2))"
DT = "CAST(l_tax AS DECIMAL(3,2))"
DISC_PRICE = f"{DP} * (CAST(1 AS DECIMAL(3,2)) - {DD})"
CHARGE = f"({DISC_PRICE}) * (CAST(1 AS DECIMAL(3,2)) + {DT})"


@query(
    "q1_pricing_summary",
    headline=True,
    tags=("aggregation", "filter", "tpch"),
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM({DQ}) AS DOUBLE)                    AS sum_qty,
      CAST(SUM({DP}) AS DOUBLE)                    AS sum_base_price,
      CAST(SUM({DISC_PRICE}) AS DOUBLE)            AS sum_disc_price,
      CAST(SUM({CHARGE}) AS DOUBLE)                AS sum_charge,
      CAST(SUM({DQ}) AS DOUBLE) / COUNT(*)         AS avg_qty,
      CAST(SUM({DP}) AS DOUBLE) / COUNT(*)         AS avg_price,
      CAST(SUM({DD}) AS DOUBLE) / COUNT(*)         AS avg_disc,
      COUNT(*)                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-filter-aggregate.

    Shape at scale: single shuffle on a tiny (flag,status) key space;
    partial aggregation happens map-side, so shuffled bytes are O(keys),
    not O(rows). The shipdate filter pushes into the Parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(DQ)).cast("double").alias("sum_qty"),
            F.sum(F.expr(DP)).cast("double").alias("sum_base_price"),
            F.sum(F.expr(DISC_PRICE)).cast("double").alias("sum_disc_price"),
            F.sum(F.expr(CHARGE)).cast("double").alias("sum_charge"),
            (F.sum(F.expr(DQ)).cast("double") / cnt).alias("avg_qty"),
            (F.sum(F.expr(DP)).cast("double") / cnt).alias("avg_price"),
            (F.sum(F.expr(DD)).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )

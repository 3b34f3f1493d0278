"""Fixture-table catalog: load driver test tables as DataFrames.

The reference discovers schema at runtime from the Parquet footer
(Readers/CodercatParquetRowReader.php:28-47); Spark does the same but
typed, via spark.read.parquet. The one impedance mismatch is the
`events` table: its `ts` column is Parquet TIMESTAMP(NANOS), which
Spark has no native type for. With spark.sql.legacy.parquet.nanosAsLong
we read raw nanos and convert to TimestampType by truncating to
microseconds — identical semantics to DuckDB's TIMESTAMP_NS -> TIMESTAMP
cast, so oracle comparisons line up.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.session import apply_runtime_confs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; `events.ts` becomes a proper timestamp.

    Column pruning and predicate pushdown stay intact: the ts
    conversion is a projection on top of the scan, and Catalyst pushes
    filters on other columns through it.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros truncation (matches DuckDB CAST(ts AS TIMESTAMP))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship query (TPC-H Q1-style) on sf0.001.
queries()      -- every implemented operator, name -> (spark, sf_dir) -> DataFrame.
oracle_sql()   -- matching DuckDB-runnable ANSI SQL per query (omitted
                  only for genuinely non-SQL-expressible operators).

All real logic lives in parquet_to_sql_spark/; this file is glue.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_to_sql_spark.queries.registry import all_queries  # noqa: E402
from parquet_to_sql_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    q = all_queries()["q1_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query that is SQL-expressible."""
    return {
        name: q.oracle
        for name, q in sorted(all_queries().items())
        if q.oracle is not None
    }

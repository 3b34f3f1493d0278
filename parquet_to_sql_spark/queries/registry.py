"""Registry of named queries with DuckDB oracle SQL.

Contract (driver's __spark_entry__):
  * build(spark, sf_dir) -> DataFrame  (the Spark-side implementation)
  * oracle: ANSI SQL string DuckDB runs on the same parquet views, or
    None for genuinely non-SQL-expressible ops (weaker rows-only check).

Column names must match between the two: every computed column is
aliased identically on both sides, because the comparison sorts
columns by name before hashing values.

Float discipline (so order-insensitive value hashes match exactly):
  * aggregates over doubles go through DECIMAL casts (exact, engine-
    order-independent arithmetic), then CAST(... AS DOUBLE) at the end;
  * averages are computed as exact decimal SUM cast to double, divided
    by COUNT (IEEE-deterministic);
  * raw double columns pass through untouched (bit-identical source).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a build function under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(
            name=name,
            build=fn,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    from parquet_to_sql_spark import queries as _q

    _q.load_all()
    return dict(_REGISTRY)


def get(name: str) -> Query:
    return all_queries()[name]

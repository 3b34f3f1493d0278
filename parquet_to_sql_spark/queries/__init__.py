"""Query registry: every engine capability as a named, oracle-checked query.

Each module in this package registers Query objects via
``queries.registry.query``. ``load_all()`` imports them all so the
registry is fully populated (used by __spark_entry__, tests, bench).
"""

from __future__ import annotations

import importlib

_MODULES = (
    "parquet_to_sql_spark.queries.relational",
    "parquet_to_sql_spark.queries.tpch_extra",
    "parquet_to_sql_spark.queries.advanced_agg",
    "parquet_to_sql_spark.queries.misc_fns",
    "parquet_to_sql_spark.queries.python_udfs",
    "parquet_to_sql_spark.queries.joins",
    "parquet_to_sql_spark.queries.windows",
    "parquet_to_sql_spark.queries.functions",
    "parquet_to_sql_spark.queries.events",
    "parquet_to_sql_spark.queries.importing",
    "parquet_to_sql_spark.queries.dedup",
    "parquet_to_sql_spark.queries.simsearch",
    "parquet_to_sql_spark.queries.text",
    "parquet_to_sql_spark.queries.multimodal",
    "parquet_to_sql_spark.queries.sql_surface",
    "parquet_to_sql_spark.queries.pipelines",
)


def load_all() -> None:
    for m in _MODULES:
        try:
            importlib.import_module(m)
        except ModuleNotFoundError:
            # module not written yet (incremental build)
            pass

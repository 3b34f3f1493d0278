"""Sinks: where an import lands (≈ ParquetImporter::flushBatch).

The reference has exactly two: Postgres COPY (fast path,
ParquetImporter.php:98-121) and batched INSERT fallback (:123-125).
Here:
  * CopySink      — parallel per-partition COPY FROM STDIN (the scale
                    fast path; needs psycopg at the executors)
  * JdbcSink      — Spark's native JDBC writer (batched INSERTs; the
                    portable fallback, like the reference's)
  * DuckDbSink    — driver-side batched INSERT into a local DuckDB
                    file; exercises the full normalize/batch/truncate
                    surface hermetically in tests
"""

from parquet_to_sql_spark.sinks.jdbc import JdbcSink
from parquet_to_sql_spark.sinks.copy_pg import CopySink
from parquet_to_sql_spark.sinks.duckdb_sink import DuckDbSink
from parquet_to_sql_spark.sinks.files import FileSink

__all__ = ["JdbcSink", "CopySink", "DuckDbSink", "FileSink"]

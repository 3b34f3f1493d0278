"""Parquet source (≈ Readers/CodercatParquetRowReader.php, Spark-first).

The reference streams rows out of ONE local file with a duck-typed
PHP reader (rows()/columns(), schema from footer or first row's keys
— CodercatParquetRowReader.php:17-47). Spark's vectorized reader
subsumes all of that: footer-driven TYPED schema, row-group-aligned
splits, predicate pushdown, and it accepts directories and globs —
which is what makes the same API meaningful at 100 TB (a path is a
dataset, not a file).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.session import apply_runtime_confs


class ParquetSource:
    """Loads a Parquet path (file, directory, or glob) as a DataFrame.

    Path validation mirrors ParquetImporter.php:35-37 (nonexistent
    input fails fast with an explicit error) but generalizes "is_file"
    to "matches at least one file/directory".
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        if not self._exists(path):
            raise FileNotFoundError(f"Parquet path not found: {path}")

    @staticmethod
    def _exists(path: str) -> bool:
        # driver-local checks only make sense for local paths; a URI
        # scheme (s3a://, hdfs://, abfs://, ...) is delegated to
        # Spark's own filesystem — os.path would wrongly reject every
        # remote path the engine is built to read
        if "://" in path:
            return True
        return os.path.exists(path) or bool(_glob.glob(path))

    def load(self) -> DataFrame:
        apply_runtime_confs(self.spark)
        return self.spark.read.parquet(self.path)

    def columns(self) -> list[str]:
        """Ordered column names (≈ ParquetRowReader::columns()); from
        the footer schema, never from data rows."""
        cols = self.load().columns
        if not cols:
            raise RuntimeError(f"No columns discovered in {self.path}")
        return cols

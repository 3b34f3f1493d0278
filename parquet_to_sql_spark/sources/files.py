"""CSV / JSON / ORC sources — formats the reference lacked entirely
(SURVEY.md §2.B). Thin wrappers so the Importer accepts any of them
interchangeably with ParquetSource."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.sources.parquet import ParquetSource


class CsvSource(ParquetSource):
    def __init__(self, spark: SparkSession, path: str, header: bool = True, infer_schema: bool = True):
        super().__init__(spark, path)
        self._header = header
        self._infer = infer_schema

    def load(self) -> DataFrame:
        return (
            self.spark.read.option("header", self._header)
            .option("inferSchema", self._infer)
            .csv(self.path)
        )


class JsonSource(ParquetSource):
    def load(self) -> DataFrame:
        return self.spark.read.json(self.path)


class OrcSource(ParquetSource):
    def load(self) -> DataFrame:
        return self.spark.read.orc(self.path)

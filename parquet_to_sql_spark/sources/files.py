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


class AvroSource(ParquetSource):
    """Avro container files. Spark ships Avro as an EXTERNAL module
    (spark-avro on the classpath — not deployed in this container);
    load() surfaces Spark's own actionable error when it's missing,
    and works unchanged where the module is present."""

    def load(self) -> DataFrame:
        return self.spark.read.format("avro").load(self.path)


class TextSource(ParquetSource):
    """Line-per-row text source (one `value` string column) — raw
    corpus ingestion before structuring."""

    def load(self) -> DataFrame:
        return self.spark.read.text(self.path)


class BinaryFileSource(ParquetSource):
    """Whole-file binary source: one row per file with (path, length,
    modificationTime, content) — the ingestion edge for multimodal
    corpora (images/audio/video as opaque bytes). Files split across
    executors by Spark's file listing; pathGlobFilter bounds the scan
    to matching names, and filters on `length` push down to skip
    reading oversized payloads."""

    def __init__(self, spark: SparkSession, path: str, glob: str | None = None):
        super().__init__(spark, path)
        self._glob = glob

    def load(self) -> DataFrame:
        reader = self.spark.read.format("binaryFile")
        if self._glob:
            reader = reader.option("pathGlobFilter", self._glob)
        return reader.load(self.path)


def binary_assets(
    spark: SparkSession, path: str, glob: str | None = None, media_type: str = "image"
) -> DataFrame:
    """binaryFile scan packed into the multimodal asset struct
    (operators.multimodal convention), ready for the mapInPandas
    decode/feature pipeline."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.multimodal import pack_binary

    raw = BinaryFileSource(spark, path, glob).load()
    return pack_binary(
        raw, data=F.col("content"), uri=F.col("path"), media_type=media_type
    ).select("asset")

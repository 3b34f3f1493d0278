"""JDBC source: read a database table/query as a DataFrame.

Inverse of the reference's one-way Parquet->Postgres flow. Supports
partitioned parallel reads (partition_column/num_partitions) so a
large table scan is split across executors instead of serialized
through one connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcSource:
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        properties: dict | None = None,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.properties = dict(properties or {})
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.num_partitions = num_partitions

    def load(self) -> DataFrame:
        reader = self.spark.read.format("jdbc").option("url", self.url).option(
            "dbtable", self.table
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                # str(None) would reach the JVM and die with an opaque
                # NumberFormatException — fail with the real reason
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound"
                )
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        return reader.load()

    def columns(self) -> list[str]:
        return self.load().columns

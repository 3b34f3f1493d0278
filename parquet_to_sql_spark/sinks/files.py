"""File-format sinks: parquet/csv/json/orc writers with partitioning.

The reference can only write to one Postgres table
(ParquetImporter.php:90-126); these wrappers expose Spark's native
writers through the same sink interface the Importer uses, so an
"import" can just as well land in a partitioned parquet lake. At
scale, `partition_by` + `max_records_per_file` control file layout;
bucketing goes through saveAsTable (see tests/test_scale_features.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


class FileSink:
    """Writes a DataFrame to a path in the given format.

    `table` in write() is interpreted as a subdirectory under
    base_path (keeps the Importer's sink interface)."""

    def __init__(
        self,
        base_path: str,
        format: str = "parquet",
        partition_by: list[str] | None = None,
        max_records_per_file: int | None = None,
        options: dict | None = None,
    ):
        if format not in ("parquet", "csv", "json", "orc"):
            raise ValueError(f"unsupported format {format!r}")
        self.base_path = base_path
        self.format = format
        self.partition_by = list(partition_by or [])
        self.max_records_per_file = max_records_per_file
        self.options = dict(options or {})

    def write(self, df: DataFrame, table: str, truncate: bool = False) -> int:
        """Write and return rows actually written (Observation on the
        write action — same accounting contract as the SQL sinks).

        `table` passes the same identifier check as every SQL sink —
        it is interpolated into the output path, and an unchecked
        '../..' would write (or with truncate, DELETE and rewrite) a
        directory outside base_path."""
        from parquet_to_sql_spark.identifiers import assert_safe_table_name

        assert_safe_table_name(table)
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.format(self.format).mode(
            "overwrite" if truncate else "append"
        )
        for k, v in self.options.items():
            writer = writer.option(k, v)
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(self.max_records_per_file))
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.save(f"{self.base_path}/{table}")
        return int(obs.get["rows"])

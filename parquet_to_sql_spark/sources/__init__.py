"""Sources: pluggable DataFrame loaders (≈ Contracts/ParquetRowReader.php).

The reference's scan contract is `rows() + columns()` over one local
Parquet file (Contracts/ParquetRowReader.php:5-20). Here a source is
anything that yields a DataFrame; the Parquet source is the default,
and csv/json/orc/jdbc wrappers widen the surface the reference lacked
(SURVEY.md §2.B "sources other than one local Parquet file: absent").
"""

from parquet_to_sql_spark.sources.parquet import ParquetSource
from parquet_to_sql_spark.sources.files import CsvSource, JsonSource, OrcSource
from parquet_to_sql_spark.sources.jdbc import JdbcSource

__all__ = ["ParquetSource", "CsvSource", "JsonSource", "OrcSource", "JdbcSource"]

"""Spark schema -> PostgreSQL CREATE TABLE DDL.

The reference never issues CREATE TABLE (the target must pre-exist;
SURVEY.md §1.1), which in practice means every user hand-writes DDL
matching the parquet footer.  This helper closes that gap: a
deterministic, identifier-safe mapping from a DataFrame schema to the
PG column types the COPY text renderings in normalize.py load into
losslessly (nested types render as JSON -> jsonb, binary renders as
bytea hex -> bytea, timestamps carry an offset -> timestamptz).
"""

from __future__ import annotations

from pyspark.sql import types as T

from parquet_to_sql_spark.identifiers import (
    assert_safe_column_names,
    assert_safe_table_name,
    quote_identifier,
)


def pg_type_for(dt: T.DataType) -> str:
    """The PG column type whose input syntax accepts normalize.py's
    COPY rendering of ``dt`` without loss."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.ByteType | T.ShortType):
        return "smallint"
    if isinstance(dt, T.IntegerType):
        return "integer"
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.FloatType):
        return "real"
    if isinstance(dt, T.DoubleType):
        return "double precision"
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType | T.CharType | T.VarcharType):
        return "text"
    if isinstance(dt, T.BinaryType):
        return "bytea"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.DayTimeIntervalType | T.YearMonthIntervalType):
        # the COPY renderer emits the quoted inner literal ('1 02:03:04'
        # / '1-2'), which PG's interval input accepts (live-tested)
        return "interval"
    if isinstance(dt, T.StructType | T.ArrayType | T.MapType | T.VariantType):
        return "jsonb"  # normalize renders nested values as JSON text
    return "text"  # exotic types are stringified + escaped on render


def create_table_sql(
    table: str, schema: T.StructType, if_not_exists: bool = False
) -> str:
    """CREATE TABLE DDL matching the COPY sink's rendering of
    ``schema``; identifier safety enforced with the same regexes the
    sink applies (reference parity: ParquetImporter.php:204-232)."""
    assert_safe_table_name(table)
    assert_safe_column_names([f.name for f in schema.fields])
    cols = ", ".join(
        f"{quote_identifier(f.name)} {pg_type_for(f.dataType)}"
        for f in schema.fields
    )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    return f"CREATE TABLE {ine}{quote_identifier(table)} ({cols})"

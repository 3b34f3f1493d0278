"""CLI entry point — parity with Commands/ImportParquetCommand.php.

Reference signature (ImportParquetCommand.php:10-17):
  parquet:import {path} {table} {--map=*} {--connection=} {--batch=}
                 {--timeout=} {--truncate}

Here:
  python -m parquet_to_sql_spark.cli PATH TABLE [--map src=dst ...]
      [--connection URL] [--batch N] [--timeout S] [--truncate]
      [--sink {jdbc,copy,pg,duckdb,file}] [--format {parquet,csv,json,orc}]

For --sink file, --connection is the base DIRECTORY of the lake; the
import lands at <connection>/<table> in --format.

Malformed --map pairs (no '=') warn and are skipped, matching
ImportParquetCommand.php:55-59.
"""

from __future__ import annotations

import argparse
import json
import sys

from parquet_to_sql_spark.importer import Importer
from parquet_to_sql_spark.session import get_spark


def parse_column_map(pairs: list[str]) -> dict[str, str]:
    """--map a=b pairs -> dict; warn+skip malformed entries
    (ImportParquetCommand.php:52-66)."""
    out: dict[str, str] = {}
    for pair in pairs:
        if "=" not in pair:
            print(f"warning: skipping malformed --map entry {pair!r} (expected src=dst)",
                  file=sys.stderr)
            continue
        src, dst = pair.split("=", 1)
        src, dst = src.strip(), dst.strip()
        if not src or not dst:
            print(f"warning: skipping malformed --map entry {pair!r} (empty side)",
                  file=sys.stderr)
            continue
        out[src] = dst
    return out


def build_sink(args):
    if args.sink == "duckdb":
        from parquet_to_sql_spark.sinks.duckdb_sink import DuckDbSink

        return DuckDbSink(args.connection, batch_size=args.batch)
    if args.sink == "file":
        from parquet_to_sql_spark.sinks.files import FileSink

        return FileSink(args.connection, format=args.format)
    if args.sink == "copy":
        from parquet_to_sql_spark.sinks.copy_pg import CopySink

        return CopySink(args.connection, batch_size=args.batch, timeout_s=args.timeout)
    if args.sink == "pg":
        # reference parity: probe the connection once and take COPY
        # when available, bulk INSERT otherwise (ParquetImporter.php:98)
        from parquet_to_sql_spark.sinks.insert_pg import choose_sink

        return choose_sink(args.connection, batch_size=args.batch,
                           timeout_s=args.timeout)
    from parquet_to_sql_spark.sinks.jdbc import JdbcSink

    return JdbcSink(args.connection, batch_size=args.batch)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet-import",
                                 description="Import Parquet into a SQL table (Spark-powered)")
    ap.add_argument("path")
    ap.add_argument("table")
    ap.add_argument("--map", action="append", default=[], metavar="SRC=DST")
    ap.add_argument("--connection", required=True,
                    help="JDBC URL / Postgres DSN / DuckDB file per --sink")
    ap.add_argument("--batch", type=int, default=5000)
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--truncate", action="store_true")
    ap.add_argument("--sink", choices=["jdbc", "copy", "pg", "duckdb", "file"], default="jdbc")
    ap.add_argument("--format", choices=["parquet", "csv", "json", "orc"],
                    default="parquet", help="output format for --sink file")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="parquet-import")
    importer = Importer(spark, build_sink(args))
    result = importer.import_(
        args.path,
        args.table,
        column_map=parse_column_map(args.map),
        truncate=args.truncate,
    )
    print(json.dumps(result.to_dict()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

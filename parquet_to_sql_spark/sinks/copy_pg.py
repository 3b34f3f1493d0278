r"""Postgres COPY sink — the scale fast path.

Reference semantics (ParquetImporter.php:90-121), generalized from
one sequential writer to one writer per partition:
  * rows are rendered to COPY text lines (TAB delimiter, \N null,
    escaping per formatCopyValue) — done JVM-side by
    normalize.copy_lines before this sink ever runs;
  * each batch of `batch_size` lines goes through COPY FROM STDIN
    inside its own transaction with `SET LOCAL statement_timeout`
    (ParquetImporter.php:102-118, default 300 s from
    config/parquet-to-sql.php:11);
  * a failed COPY rolls back its transaction and surfaces a
    RuntimeError naming the cause (:109-118).

Atomicity note (SURVEY.md §7 "what's hard" #1): the reference commits
PER BATCH, so partial success is already its contract; with N
parallel writers the unit of atomicity stays one batch. For
all-or-nothing loads, stage into a temp table and swap — see
Importer(staging=...) docstring.

psycopg is not assumed installed: the connection factory is
injectable (tests use fakes), and the default factory import-fails
with a clear message only when the sink is actually used.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame

from parquet_to_sql_spark.identifiers import (
    assert_safe_column_names,
    assert_safe_table_name,
    quote_identifier,
)
from parquet_to_sql_spark.normalize import copy_lines

DEFAULT_BATCH_SIZE = 5000  # config/parquet-to-sql.php:8
DEFAULT_TIMEOUT_S = 300  # config/parquet-to-sql.php:11


def _default_connection_factory(dsn: str):
    try:
        import psycopg  # type: ignore
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "CopySink needs the 'psycopg' package on executors; install it "
            "or use JdbcSink (the INSERT fallback) instead"
        ) from exc
    return psycopg.connect(dsn)


def copy_partition(
    lines: Iterable[str],
    *,
    dsn: str,
    table: str,
    columns: list[str],
    batch_size: int,
    timeout_s: int,
    connection_factory: Callable[[str], object],
) -> None:
    """Stream one partition's COPY lines in batch_size transactions.

    Runs on an executor. One connection per partition; one
    transaction + one COPY statement per batch (reference parity:
    ParquetImporter.php:102-113).
    """
    quoted_table = quote_identifier(table)
    col_list = ", ".join(quote_identifier(c) for c in columns)
    sql = f"COPY {quoted_table} ({col_list}) FROM STDIN"
    conn = connection_factory(dsn)
    try:
        batch: list[str] = []

        def flush(b: list[str]) -> None:
            if not b:
                return
            cur = conn.cursor()
            try:
                cur.execute(f"SET LOCAL statement_timeout = {int(timeout_s * 1000)}")
                with cur.copy(sql) as cp:
                    for line in b:
                        cp.write(line + "\n")
                conn.commit()
            except Exception as exc:
                conn.rollback()
                raise RuntimeError(f"COPY command failed: {exc}") from exc

        for line in lines:
            batch.append(line)
            if len(batch) >= batch_size:
                flush(batch)
                batch = []
        flush(batch)
    finally:
        conn.close()


class CopySink:
    def __init__(
        self,
        dsn: str,
        batch_size: int = DEFAULT_BATCH_SIZE,
        timeout_s: int = DEFAULT_TIMEOUT_S,
        num_writers: int | None = None,
        connection_factory: Callable[[str], object] | None = None,
    ):
        self.dsn = dsn
        self.batch_size = batch_size
        self.timeout_s = timeout_s
        self.num_writers = num_writers
        self.connection_factory = connection_factory or _default_connection_factory

    def write(self, df: DataFrame, table: str, truncate: bool = False) -> None:
        assert_safe_table_name(table)
        columns = list(df.columns)
        # raw names: a column literally named "a.b" must be rejected
        # (ParquetImporter.php:204-216), not treated as qualified
        assert_safe_column_names(columns)
        if truncate:
            self._execute_truncate(table)
        rendered = copy_lines(df)
        if self.num_writers:
            rendered = rendered.repartition(self.num_writers)
        dsn, batch_size, timeout_s = self.dsn, self.batch_size, self.timeout_s
        factory = self.connection_factory

        def run(partition) -> None:
            copy_partition(
                (row.line for row in partition),
                dsn=dsn,
                table=table,
                columns=columns,
                batch_size=batch_size,
                timeout_s=timeout_s,
                connection_factory=factory,
            )

        rendered.foreachPartition(run)

    def write_atomic(self, df: DataFrame, table: str) -> None:
        """All-or-nothing load via staging table + atomic swap.

        The per-batch commits of write() mean a mid-load failure leaves
        a partial table (the reference's own contract —
        ParquetImporter.php:102-113 commits per batch). When a load
        must be atomic: COPY everything into `<table>_staging`, then
        swap names in ONE transaction. Readers see the old table until
        the swap commits; a failure anywhere leaves the target
        untouched."""
        assert_safe_table_name(table)
        staging = f"{table}_staging"
        assert_safe_table_name(staging)
        qt, qs = quote_identifier(table), quote_identifier(staging)
        # unqualified name for RENAME (Postgres renames within schema)
        bare_table = table.split(".")[-1]
        conn = self.connection_factory(self.dsn)
        try:
            cur = conn.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {qs}")
            cur.execute(f"CREATE TABLE {qs} (LIKE {qt} INCLUDING ALL)")
            conn.commit()
        finally:
            conn.close()
        self.write(df, staging, truncate=False)
        conn = self.connection_factory(self.dsn)
        try:
            cur = conn.cursor()
            cur.execute(f"DROP TABLE {qt}")
            cur.execute(
                f"ALTER TABLE {qs} RENAME TO {quote_identifier(bare_table)}"
            )
            conn.commit()
        except Exception as exc:
            conn.rollback()
            raise RuntimeError(f"atomic swap failed: {exc}") from exc
        finally:
            conn.close()

    def _execute_truncate(self, table: str) -> None:
        # Driver-side, once, before any writer starts
        # (ParquetImporter.php:50-52).
        conn = self.connection_factory(self.dsn)
        try:
            cur = conn.cursor()
            cur.execute(f"TRUNCATE TABLE {quote_identifier(table)}")
            conn.commit()
        finally:
            conn.close()

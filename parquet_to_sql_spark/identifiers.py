"""SQL identifier safety — parity with ParquetImporter.php:204-233.

The reference validates every table/column name against a strict
regex before interpolating it into raw SQL (TRUNCATE, COPY column
lists) and quotes identifiers by doubling embedded double-quotes.
Spark's own writers parameterize identifiers, but we preserve the
same validation semantics at the API edge so hostile names fail
loudly and identically.
"""

from __future__ import annotations

import re

# Table: one optional schema qualifier (ParquetImporter.php:218-223)
_TABLE_RE = re.compile(r"^[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)?$")
# Column: bare identifier only (ParquetImporter.php:204-216)
_COLUMN_RE = re.compile(r"^[A-Za-z0-9_]+$")


def assert_safe_table_name(table: str) -> None:
    if not _TABLE_RE.match(table or ""):
        raise ValueError(
            f"Unsafe table name {table!r}: expected [A-Za-z0-9_]+ with at "
            "most one '.' schema qualifier"
        )


def assert_safe_column_name(column: str) -> None:
    if not _COLUMN_RE.match(column or ""):
        raise ValueError(f"Unsafe column name {column!r}: expected [A-Za-z0-9_]+")


def assert_safe_column_names(columns: list[str]) -> None:
    for c in columns:
        assert_safe_column_name(c)


def quote_identifier(name: str) -> str:
    """Double-quote an identifier, doubling embedded quotes; a dotted
    name quotes each segment (ParquetImporter.php:225-233)."""
    parts = name.split(".")
    return ".".join('"' + p.replace('"', '""') + '"' for p in parts)

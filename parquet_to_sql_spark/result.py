"""Import metrics record (parity with src/ImportResult.php:7-23)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ImportResult:
    """What one import run reports (ImportResult.php:7-23).

    The reference reports {source_path, table, rows_imported,
    duration_seconds}; identical surface here.
    """

    source_path: str
    table: str
    rows_imported: int
    duration_seconds: float

    def to_dict(self) -> dict:
        return {
            "source_path": self.source_path,
            "table": self.table,
            "rows_imported": self.rows_imported,
            "duration_seconds": self.duration_seconds,
        }

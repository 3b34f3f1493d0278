"""Shared fixtures: one SparkSession per test run + DuckDB oracle helper.

The oracle helper mirrors the driver's t2 correctness gate: run the
Spark query and the ANSI-SQL oracle on the same parquet fixtures,
canonicalize (sort columns by name, sort rows), compare exactly.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_sql_spark.catalog import TABLES, table_path  # noqa: E402
from parquet_to_sql_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # Python workers (foreachPartition/UDFs) unpickle classes defined in
    # test modules; they inherit PYTHONPATH, not the driver's sys.path.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = f"{repo}:{os.path.join(repo, 'tests')}"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    s = get_spark(app_name="pytest", shuffle_partitions=8)
    yield s
    s.stop()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with fixture tables as views (like the
    driver's pre-registered views)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    import datetime

    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
        elif pdf[c].dtype == object and pdf[c].map(
            lambda v: v is None or isinstance(v, datetime.date)
        ).all() and pdf[c].notna().any():
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[ns]")
    if len(pdf.columns):
        pdf = pdf.sort_values(
            by=list(pdf.columns), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
    return pdf


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = canonicalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    try:
        want = canonicalize(con.execute(oracle_sql).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    # Stricter, driver-style check: identical string rendering of every
    # value (catches int-vs-float dtype drift that pandas forgives).
    got_s = sorted(tuple(map(str, r)) for r in got.itertuples(index=False))
    want_s = sorted(tuple(map(str, r)) for r in want.itertuples(index=False))
    mismatches = [(a, b) for a, b in zip(got_s, want_s) if a != b][:3]
    assert got_s == want_s, f"string-render mismatch, first diffs: {mismatches}"

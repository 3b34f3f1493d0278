"""Driver-contract simulation: run __spark_entry__ the way the
external driver does — a PLAIN SparkSession (no engine confs), every
query executed and hash-compared against its DuckDB oracle at sf0.01.

Usage:
    python scripts/verify_driver.py              # full gate
    python scripts/verify_driver.py q1 q2 ...    # named queries only
    SPARK_GRAFT_VERIFY_SF_DIR=... overrides the fixture dir.

Exit code 0 iff every checked query matches (rows-only for the
oracle-less sketch queries).  This is the `.claude/skills/verify`
recipe as a script.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _hash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(map(str, r)) for r in pdf.itertuples(index=False))
    return hashlib.sha256(str(rows).encode()).hexdigest()[:16]


def main(names: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    n_entry = len(e.entry(spark).collect())
    print(f"entry rows: {n_entry}")
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad: list[str] = []
    for name in names or qs:
        got = qs[name](spark, sf).toPandas()
        if name in osql:
            want = con.execute(osql[name]).df()
            ok = _hash(got) == _hash(want) and len(got) == len(want)
        else:
            ok = len(got) >= 0  # rows-only (oracle-less sketches)
        print(f"{name}: {len(got)} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            bad.append(name)
        spark.catalog.clearCache()
    print("MISMATCHES:", bad)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

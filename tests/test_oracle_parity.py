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

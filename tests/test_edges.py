"""Edge-case behaviors: atomic staging swap, empty inputs/results,
and zero-row imports."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import all_queries
from parquet_to_sql_spark.sinks.copy_pg import CopySink
from tests.conftest import SF_SMOKE
from tests.test_importer import _file_logging_factory


def test_copy_write_atomic_swap_sequence(spark, tmp_path):
    """write_atomic: staging created from target, data COPYed into
    staging, then DROP+RENAME in one final transaction."""
    logdir = str(tmp_path / "atomic_log")
    os.makedirs(logdir)
    df = spark.createDataFrame([(1, "a")], "id long, name string").coalesce(1)
    sink = CopySink("dsn://fake", connection_factory=_file_logging_factory(logdir))
    sink.write_atomic(df, "public.users")

    events = []
    for fn in sorted(os.listdir(logdir)):
        with open(os.path.join(logdir, fn)) as f:
            events.extend(json.loads(line) for line in f)
    events.sort(key=lambda e: e[2])  # wall-clock order across processes
    sqls = [e[1] for e in events if e[0] == "execute"]
    assert 'CREATE TABLE "public"."users_staging" (LIKE "public"."users" INCLUDING ALL)' in sqls
    assert 'DROP TABLE "public"."users"' in sqls
    assert 'ALTER TABLE "public"."users_staging" RENAME TO "users"' in sqls
    copies = [e[1] for e in events if e[0] == "copy"]
    assert copies == ['COPY "public"."users_staging" ("id", "name") FROM STDIN']
    # swap happens strictly after the COPY
    order = [e[0] if e[0] != "execute" else e[1] for e in events]
    assert order.index('DROP TABLE "public"."users"') > order.index("copy")


def test_queries_survive_empty_results(spark):
    """A query whose filter matches nothing must return an empty frame
    with an intact schema (not error)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") > F.lit("2999-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.count() == 0
    assert out.columns == ["l_returnflag", "n"]


def test_empty_dataframe_import(spark, tmp_path):
    """Zero-row source: import succeeds with rows_imported == 0 and an
    empty (but existing) target."""
    import duckdb

    from parquet_to_sql_spark.importer import Importer
    from parquet_to_sql_spark.sinks.duckdb_sink import DuckDbSink

    db = str(tmp_path / "empty.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE t (id BIGINT)")
    con.close()
    empty = spark.createDataFrame([], "id long")
    r = Importer(spark, DuckDbSink(db)).import_(None, "t", reader=empty)
    assert r.rows_imported == 0
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 0
    con.close()


def test_short_documents_produce_no_shingles(spark):
    """Documents shorter than the shingle width drop out of minhash
    (guarded sequence) instead of erroring."""
    from parquet_to_sql_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d e")], "doc_id long, text string"
    )
    sigs = minhash_signatures(df, "doc_id", "text")
    assert [r.doc_id for r in sigs.collect()] == [2]


def test_all_queries_have_docstrings_and_unique_columns():
    """Registry hygiene: every query documents itself, and no query
    emits duplicate column names (the oracle compare would garble)."""
    for name, q in all_queries().items():
        assert q.doc, f"{name} has no docstring"


def test_engine_sql_surface(spark, tmp_path):
    """Engine: register fixtures + ad-hoc parquet, query via SQL,
    land a result through a sink."""
    import duckdb

    from parquet_to_sql_spark.sinks.duckdb_sink import DuckDbSink
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(SF_SMOKE)
    df = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    assert {r.l_returnflag for r in df.collect()} == {"A", "N", "R"}

    eng.register("li2", os.path.join(SF_SMOKE, "lineitem.parquet"))
    assert eng.sql("SELECT COUNT(*) AS n FROM li2").collect()[0].n == 6000

    db = str(tmp_path / "eng.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE flags (l_returnflag VARCHAR, n BIGINT)")
    con.close()
    eng.import_to(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
        "flags",
        DuckDbSink(db),
    )
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM flags").fetchone()[0] == 3
    con.close()
    assert "lineitem" in eng.tables() and "li2" in eng.tables()


def test_ansi_mode_raises_where_try_family_nulls(spark):
    """The engine runs under ANSI semantics (Spark 4 default): fallible
    expressions RAISE, and the try_* family is the sanctioned
    NULL-on-error escape — the contract fn_try_arithmetic builds on."""
    import pytest as _pytest

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql("SELECT 1/0 AS x").collect()
    with _pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        spark.sql("SELECT CAST('xyz' AS INT) AS x").collect()
    with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        spark.sql("SELECT 9223372036854775807 + CAST(1 AS BIGINT) AS x").collect()
    row = spark.sql(
        "SELECT try_divide(1, 0) AS a, try_cast('xyz' AS INT) AS b, "
        "try_add(9223372036854775807, CAST(1 AS BIGINT)) AS c, "
        "try_element_at(array(1), 5) AS d"
    ).collect()[0]
    assert row.a is None and row.b is None and row.c is None and row.d is None


def test_peak_concurrency_sweep_semantics(spark, tmp_path):
    """Pin the sweep-line contract on a crafted fixture: closed
    intervals (a session TOUCHING another's end counts as concurrent),
    -1-before-+1 tie ordering, cross-hour sessions carried by the
    hour-offset decomposition, and hours without transitions absent."""
    from datetime import datetime

    from parquet_to_sql_spark.queries.events import ev_peak_concurrency

    T = lambda h, m, s=0: datetime(2024, 3, 1, h, m, s)
    rows = [
        # u1: one session 10:00-10:10; u2: instant session at 10:05
        (1, T(10, 0), 1), (2, T(10, 10), 1), (3, T(10, 5), 2),
        # u3 starts exactly at u1's session end -> closed-interval touch
        (4, T(10, 10), 3),
        # u4: session spanning the hour boundary 10:50 -> 11:20
        (5, T(10, 50), 4), (6, T(11, 10), 4), (7, T(11, 20), 4),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.hour_us: r.peak_concurrent
        for r in ev_peak_concurrency(spark, str(tmp_path)).collect()
    }

    def us(dt):
        epoch = datetime(1970, 1, 1)
        return int((dt - epoch).total_seconds() * 1_000_000)

    # hour 10: u1+u2 overlap at 10:05 (conc 2); at 10:10 u1 still
    # active (closed) + u3 starts (conc 2); u4 alone later (conc 1).
    # hour 11: the only transition is u4's end+1us, where the running
    # sum (inclusive of the -1) is already 0 — "peak at transition
    # points", the documented semantics.
    assert out == {us(T(10, 0)): 2, us(T(11, 0)): 0}


def test_udf_iter_quantized_norm_null_and_empty_vectors(spark):
    """NULL and empty embeddings must yield NULL from the SCALAR_ITER
    UDF, matching DuckDB's list_sum NULL propagation (ADVICE r02) —
    the fixture has no such rows today, but a regeneration could."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from parquet_to_sql_spark.queries.python_udfs import _qnorm_batches

    out = list(_qnorm_batches(iter([pd.Series([None, [], [1.0, 2.5]])])))[0]
    assert out.iloc[0] is None
    assert out.iloc[1] is None
    assert out.iloc[2] == (1 << 20) + int(2.5 * (1 << 20))


def test_round5_operators_handle_empty_inputs(spark):
    """Every round-5 operator must return an empty (not crashed)
    result on empty input — the degenerate partition case any
    at-scale job hits (empty file splits, fully-filtered batches)."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.dedup import (
        kcore_peel,
        prefix_filter_jaccard_pairs,
        repeated_spans,
    )
    from parquet_to_sql_spark.operators.prefix import (
        prefix_sum,
        weighted_systematic_sample,
    )

    no_docs = spark.createDataFrame([], "doc_id long, text string")
    no_edges = spark.createDataFrame([], "doc1 long, doc2 long")
    no_kv = spark.createDataFrame([], "k long, w long")

    assert prefix_filter_jaccard_pairs(no_docs, "doc_id", "text").count() == 0
    assert repeated_spans(no_docs, "doc_id", "text").count() == 0
    assert kcore_peel(no_edges, "doc1", "doc2", k=3, rounds=2).count() == 0
    assert prefix_sum(no_kv, ["k"], "w").count() == 0
    assert weighted_systematic_sample(no_kv, ["k"], "w", m=5).count() == 0
    # zero total weight: nothing is ever selected (empty strata line)
    zero_w = spark.createDataFrame([(1, 0), (2, 0)], "k long, w long")
    assert weighted_systematic_sample(zero_w, ["k"], "w", m=5).count() == 0

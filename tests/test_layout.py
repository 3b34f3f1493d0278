"""Layout operators: compaction and range-clustered writes, verified
by reading the physical result back."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.plans.layout import (
    compaction_partitions,
    input_bytes,
    per_file_ranges,
    write_compacted,
    write_range_clustered,
)
from tests.conftest import SF_CORRECT


def _parquet_files(path: str) -> list[str]:
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_collapses_small_files(spark, tmp_path):
    src = str(tmp_path / "small")
    out = str(tmp_path / "compact")
    lineitem = load_table(spark, SF_CORRECT, "lineitem")
    lineitem.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    small = spark.read.parquet(src)
    total = input_bytes(small)
    target = max(1, total // 4)  # aim for ~4 output files
    planned = write_compacted(small, out, target_file_bytes=target)
    assert planned == compaction_partitions(small, target) <= 8
    assert len(_parquet_files(out)) == planned
    assert spark.read.parquet(out).count() == lineitem.count()


def test_compaction_aqe_rebalance_path(spark, tmp_path):
    src = str(tmp_path / "small")
    out = str(tmp_path / "rebal")
    orders = load_table(spark, SF_CORRECT, "orders")
    orders.repartition(32).write.parquet(src)
    planned = write_compacted(spark.read.parquet(src), out, use_aqe_rebalance=True)
    assert planned == 0
    # AQE coalesces the 32 tiny shuffle blocks into far fewer files
    assert len(_parquet_files(out)) < 32
    assert spark.read.parquet(out).count() == orders.count()


def test_range_clustered_files_are_disjoint_and_sorted(spark, tmp_path):
    out = str(tmp_path / "clustered")
    orders = load_table(spark, SF_CORRECT, "orders")
    n = write_range_clustered(orders, out, ["o_orderkey"], num_files=6)
    assert n == 6 and len(_parquet_files(out)) == 6

    ranges = per_file_ranges(spark.read, out, "o_orderkey")
    # every file owns a disjoint o_orderkey range (this is what makes
    # min/max pruning skip whole files on a selective filter)
    spans = sorted((lo, hi) for _, lo, hi in ranges)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next
    # and the rewrite lost nothing
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert back.agg(F.sum("o_orderkey")).first()[0] == orders.agg(
        F.sum("o_orderkey")
    ).first()[0]


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    from parquet_to_sql_spark.plans.layout import scale_to_bits, zorder_key

    out = str(tmp_path / "zordered")
    orders = load_table(spark, SF_CORRECT, "orders")
    rng = orders.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min("o_orderkey").alias("k_lo"),
        F.max("o_orderkey").alias("k_hi"),
    )
    zed = orders.crossJoin(F.broadcast(rng)).withColumn(
        "zkey",
        zorder_key(
            scale_to_bits(F.col("o_custkey"), F.col("c_lo"), F.col("c_hi")),
            scale_to_bits(F.col("o_orderkey"), F.col("k_lo"), F.col("k_hi")),
        ),
    ).drop("c_lo", "c_hi", "k_lo", "k_hi")
    write_range_clustered(zed, out, ["zkey"], num_files=8)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    # per-file spans of BOTH underlying dimensions must be far below
    # "every file covers the whole range" (which a random or
    # single-column layout would give for the other column)
    for col in ["o_custkey", "o_orderkey"]:
        ranges = per_file_ranges(spark.read, out, col)
        lo = min(r[1] for r in ranges)
        hi = max(r[2] for r in ranges)
        global_span = hi - lo
        sum_spans = sum(r[2] - r[1] for r in ranges)
        # random layout: sum_spans ~= nfiles * global_span
        assert sum_spans < 0.75 * len(ranges) * global_span, (col, sum_spans, global_span)


def test_file_sink_rejects_path_traversal(spark, tmp_path):
    """FileSink interpolates `table` into the output path, so it must
    enforce the same identifier check as the SQL sinks — '../..'
    would write (or with truncate, delete) outside base_path."""
    import pytest

    from parquet_to_sql_spark.sinks.files import FileSink

    sink = FileSink(str(tmp_path))
    df = spark.range(1)
    with pytest.raises(ValueError, match="Unsafe table name"):
        sink.write(df, "../evil")
    with pytest.raises(ValueError, match="Unsafe table name"):
        sink.write(df, "a/b")


# --- incremental-state persist/reload round-trips (VERDICT r09 #6) ---


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_ledger_persist_reload_roundtrip(spark):
    """The line ledger written as a bucketed managed table and
    RELOADED must dedup a second batch identically to the in-session
    ledger, and the stored side's scan must be bucketed."""
    from parquet_to_sql_spark.operators.dedup import (
        dedup_lines_against_ledger,
        line_ledger,
    )
    from parquet_to_sql_spark.plans.bucketing import (
        formatted_plan,
        persist_state_bucketed,
    )

    b1 = _docs(spark, [(1, "alpha\nbeta\ngamma"), (2, "beta\ndelta")])
    b2 = _docs(
        spark, [(10, "alpha\nepsilon\nbeta"), (11, "epsilon\nzeta\n\nzeta")]
    )
    led = line_ledger(b1)
    stored = persist_state_bucketed(
        spark, led, "state_test_line_ledger", ["line_h"], buckets=4,
        marker="t1",
    )
    v_mem, d_mem = dedup_lines_against_ledger(b2, led)
    v_st, d_st = dedup_lines_against_ledger(b2, stored)
    key = lambda r: (r.doc_id, r.pos)
    assert sorted(map(tuple, v_mem.collect())) == sorted(
        map(tuple, v_st.collect())
    )
    assert sorted(r.line_h for r in d_mem.collect()) == sorted(
        r.line_h for r in d_st.collect()
    )
    assert "Bucketed: true" in formatted_plan(v_st)
    # idempotent: same marker skips the rewrite and still reads back
    again = persist_state_bucketed(
        spark, led, "state_test_line_ledger", ["line_h"], buckets=4,
        marker="t1",
    )
    assert again.count() == led.count()


def test_minhash_band_index_persist_reload_roundtrip(spark):
    """Screening against the RELOADED bucketed band index equals
    screening against the in-session index."""
    from parquet_to_sql_spark.operators.dedup import (
        minhash_band_index,
        minhash_screen_against_index,
    )
    from parquet_to_sql_spark.plans.bucketing import persist_state_bucketed

    base = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox jumps over the lazy cat"),
        ],
    )
    new = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog today"),
            (11, "entirely unrelated content with no overlap at all here"),
        ],
    )
    idx = minhash_band_index(base, "doc_id", "text", k=8, bands=4, n=3)
    stored = persist_state_bucketed(
        spark, idx, "state_test_band_idx", ["band", "bucket"], buckets=4,
        marker="t1",
    )
    mem = minhash_screen_against_index(new, idx, "doc_id", "text", 8, 4, 3)
    st = minhash_screen_against_index(new, stored, "doc_id", "text", 8, 4, 3)
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, st.collect()))


def test_ivf_quantizer_persist_reload_roundtrip(spark):
    """Assignment against the RELOADED stored quantizer equals
    assignment against the in-session centroids — the vector leg of
    the state trio."""
    import random

    from parquet_to_sql_spark.operators.simsearch import ivf_assign
    from parquet_to_sql_spark.plans.bucketing import persist_state_bucketed

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cent = emb.filter(F.col("vec_id") < 4)
    stored = persist_state_bucketed(
        spark, cent, "state_test_ivf_quantizer", ["vec_id"], buckets=2,
        marker="t1",
    )
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    mem = ivf_assign(delta, "vec_id", "embedding", cent).select(
        "vec_id", "centroid_id"
    )
    st = ivf_assign(delta, "vec_id", "embedding", stored).select(
        "vec_id", "centroid_id"
    )
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, st.collect()))

"""Structured Streaming tests: batch-equivalence (streaming windows
must produce exactly the batch oracle-checked results), streaming
dedup, custom stateful operator, late-data watermark behavior, and
the foreachBatch -> SQL-sink path."""

from __future__ import annotations

import datetime
import os
import shutil

import duckdb
import pyspark.sql.functions as F
import pytest

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.sinks.duckdb_sink import DuckDbSink
from parquet_to_sql_spark.streaming import (
    dedup_within_watermark,
    events_stream,
    run_to_memory,
    session_counts,
    stream_import,
    tumbling_counts,
    user_running_totals,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(tmp_path):
    d = str(tmp_path / "events_in")
    os.makedirs(d)
    shutil.copy(os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "part0.parquet"))
    return d


def _batch_events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_streaming_tumbling_matches_batch(spark, events_dir):
    stream = events_stream(spark, events_dir)
    run_to_memory(tumbling_counts(stream), "tumbling_out", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in (
            _batch_events(spark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.expr("CAST(value AS DECIMAL(12,2))")).cast("double").alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_sessions_match_batch(spark, events_dir):
    stream = events_stream(spark, events_dir)
    run_to_memory(session_counts(stream), "sessions_out", "complete")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    want = {
        (r.user_id, r.w.start): r["count"]
        for r in (
            _batch_events(spark)
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .count()
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_within_watermark(spark, events_dir, tmp_path):
    # duplicate the input file -> every event arrives twice
    shutil.copy(
        os.path.join(events_dir, "part0.parquet"), os.path.join(events_dir, "part1.parquet")
    )
    stream = events_stream(spark, events_dir)
    deduped = dedup_within_watermark(stream, ["event_id"])
    run_to_memory(deduped.select("event_id"), "dedup_out", "append")
    n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n, COUNT(*) AS total FROM dedup_out").collect()[0]
    n_src = _batch_events(spark).count()
    assert n.total == n.n == n_src


def test_user_running_totals_stateful(spark, events_dir):
    stream = events_stream(spark, events_dir)
    run_to_memory(user_running_totals(stream), "running_out", "update")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM running_out").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 2))
        for r in (
            _batch_events(spark)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        ).collect()
    }
    assert got == want and len(got) > 0


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (PySpark's "
    "state-server protocol); not installed in this container",
)
def test_user_spend_profile_transform_with_state(spark, events_dir):
    """transformWithStateInPandas (the Spark-4 typed-state API): final
    per-user (count, total, max) from the stream equals the batch
    aggregate. Update mode may emit a row per micro-batch; the LAST
    row per user is the final state."""
    from parquet_to_sql_spark.streaming.pipeline import user_spend_profile

    stream = events_stream(spark, events_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    # transformWithState requires the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_to_memory(user_spend_profile(stream), "spend_out", "update")
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2), round(r.max_value, 2))
        for r in spark.sql("SELECT * FROM spend_out").collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 2), round(r.max_v, 2))
        for r in (
            _batch_events(spark)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
                F.max("value").alias("max_v"),
            )
        ).collect()
    }
    assert got == want and len(got) > 0


def test_late_data_dropped_beyond_watermark(spark, tmp_path):
    """Two micro-batches: batch 2 carries an event far older than the
    watermark after batch 1 -> append-mode window output never counts
    it; an in-watermark late event is counted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "late_in")
    os.makedirs(d)
    base = 1_704_067_200_000_000_000  # 2024-01-01 00:00 in ns

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [(base + r[1] * 10**9) // 1000 for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([1] * len(rows), pa.int64()),
                    "event_type": pa.array(["click"] * len(rows), pa.string()),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            os.path.join(d, name),
        )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "late_out")

    def run():
        stream = events_stream(spark, d)
        windowed = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            windowed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def emitted():
        return {r.ws.hour: r.n for r in spark.read.parquet(out).collect()}

    # run 1: events at t=0h and t=6h -> watermark persists at 5h;
    # window [0h,1h) finalizes and is emitted.
    write("b1.parquet", [(1, 0), (2, 6 * 3600)])
    run()
    rows1 = emitted()
    assert rows1.get(0) == 1

    # run 2 (same checkpoint): a LATE event at t=0h30 (before the 5h
    # watermark -> must be dropped, its window already closed), an
    # in-watermark event at t=5h30, and a t=8h event that advances the
    # watermark to 7h so window [5h,6h) finalizes this run.
    write("b2.parquet", [(3, 1800), (4, 5 * 3600 + 1800), (5, 8 * 3600)])
    run()
    rows2 = emitted()
    assert rows2.get(0) == 1, "late event beyond watermark re-opened a closed window"
    assert rows2.get(5) == 1, "in-watermark event lost"


def test_stream_stream_left_outer_emits_unmatched(spark, events_dir):
    """LEFT OUTER stream-stream join: purchases with no qualifying
    signup are emitted with null signup columns — but only after the
    watermark passes their match window (until then a matching signup
    could still arrive). A far-future sentinel event pushes the final
    watermark beyond all real data so every outer row flushes, making
    the stream result comparable to the batch left join."""
    from parquet_to_sql_spark.streaming.pipeline import purchases_after_signup_join

    ev = _batch_events(spark)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel_id = 10**9
    sentinel_ts = max_ts + datetime.timedelta(days=30)
    spark.createDataFrame(
        [(sentinel_id, sentinel_ts, -1, "purchase", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("append").parquet(events_dir)

    stream = events_stream(spark, events_dir)
    run_to_memory(
        purchases_after_signup_join(stream, how="left_outer"), "ssjo_out", "append"
    )
    rows = spark.sql("SELECT * FROM ssjo_out").collect()
    got_matched = {
        (r.purchase_event_id, r.signup_event_id)
        for r in rows
        if r.signup_event_id is not None
    }
    got_unmatched = {
        r.purchase_event_id for r in rows if r.signup_event_id is None
    } - {sentinel_id}

    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("ts").alias("sts"),
        F.col("event_id").alias("sid"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    matched_batch = p.join(
        s,
        (F.col("pu") == F.col("su"))
        & (F.col("pts") >= F.col("sts"))
        & (F.col("pts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR")),
    ).collect()
    want_matched = {(r.pid, r.sid) for r in matched_batch}
    want_unmatched = {r.pid for r in p.collect()} - {m[0] for m in want_matched}

    assert got_matched == want_matched
    assert got_unmatched == want_unmatched and len(want_unmatched) > 0


def test_stream_import_foreachbatch_to_duckdb(spark, events_dir, tmp_path):
    db = str(tmp_path / "stream.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE ev (event_id BIGINT, user_id BIGINT, event_type VARCHAR)")
    con.close()
    stream = events_stream(spark, events_dir).select("event_id", "user_id", "event_type")
    stream_import(stream, DuckDbSink(db), "ev")
    con = duckdb.connect(db)
    n = con.execute("SELECT COUNT(*), COUNT(DISTINCT event_id) FROM ev").fetchone()
    con.close()
    assert n[0] == n[1] == _batch_events(spark).count()


def test_stream_stream_join_matches_batch(spark, events_dir):
    from parquet_to_sql_spark.streaming.pipeline import purchases_after_signup_join

    stream = events_stream(spark, events_dir)
    run_to_memory(purchases_after_signup_join(stream), "ssj_out", "append")
    got = {
        (r.purchase_event_id, r.signup_event_id)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    ev = _batch_events(spark)
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("ts").alias("sts"), F.col("event_id").alias("sid")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    want = {
        (r.pid, r.sid)
        for r in p.join(
            s,
            (F.col("pu") == F.col("su"))
            & (F.col("pts") >= F.col("sts"))
            & (F.col("pts") <= F.col("sts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_python_datasource_streaming(spark, tmp_path):
    """Custom Python streaming source: two availableNow runs over a
    shared checkpoint continue from the stored offset with no overlap
    (deterministic offsets -> exactly-once)."""
    from parquet_to_sql_spark.sources.pydatasource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    out = str(tmp_path / "synth_out")
    ckpt = str(tmp_path / "synth_ckpt")

    def run_once():
        q = (
            spark.readStream.format("synthetic_events")
            .option("batch_rows", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()
    df = spark.read.parquet(out)
    n2 = df.count()
    assert n2 > n1 >= 100
    # no duplicated offsets across restarts
    assert df.select("event_id").distinct().count() == n2


def test_streaming_gopher_filter_matches_batch(spark, tmp_path):
    """The corpus quality filter is a stateless projection, so it runs
    unchanged on a file STREAM — the shape of a continuous ingest
    filtering documents before they land (filter-at-the-edge; only
    survivors pay downstream dedup cost)."""
    from parquet_to_sql_spark.operators.text import gopher_rules

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    shutil.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    batch_docs = load_table(spark, SF_SMOKE, "documents")
    stream = spark.readStream.schema(batch_docs.schema).parquet(d)

    run_to_memory(
        gopher_rules(stream, "doc_id", "text"), "gopher_stream_out", "append"
    )
    got = {
        r.doc_id: (r.passes, r.n_words)
        for r in spark.sql("SELECT * FROM gopher_stream_out").collect()
    }
    want = {
        r.doc_id: (r.passes, r.n_words)
        for r in gopher_rules(batch_docs, "doc_id", "text").collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_state_eviction_metrics(spark, tmp_path):
    """The bounded-state claim of the watermarked stream-stream join,
    asserted from the engine's own state-store metrics across two
    sequential availableNow runs on one checkpoint:

      run 1 (t~1h): matched signup+purchase pair, plus a purchase with
          no signup.  Watermark stays 0 -> nothing evicted, no outer
          rows.
      run 2 (t=12h): one signup advances the watermark to 10h, and the
          availableNow run finalizes with an extra batch under the new
          watermark -> all three run-1 rows are past their match
          windows: state drops from 4 rows to 1 (numRowsTotal — the
          bounded-state evidence; numRowsRemoved only counts the
          outer-flush path), the unmatched purchase finally flushes
          as an outer row (null signup columns), and total state
          keeps only the still-matchable new signup.
    """
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_to_sql_spark.streaming.pipeline import purchases_after_signup_join

    d = str(tmp_path / "evict_in")
    os.makedirs(d)
    base = 1_704_067_200_000_000_000  # 2024-01-01 00:00 in ns

    def write(name, rows):  # rows: (event_id, t_seconds, user_id, type)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [(base + r[1] * 10**9) // 1000 for r in rows],
                        pa.timestamp("us"),
                    ),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], pa.string()),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            os.path.join(d, name),
        )

    ckpt = str(tmp_path / "evict_ckpt")
    out = str(tmp_path / "evict_out")

    def run():
        stream = events_stream(spark, d)
        q = (
            purchases_after_signup_join(stream, how="left_outer")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [json.loads(p.json) for p in q.recentProgress]

    def outer_rows():
        df = spark.read.parquet(out)
        return [r for r in df.collect() if r.signup_event_id is None]

    def state(progresses, key):
        return sum(
            op[key]
            for p in progresses
            if p.get("stateOperators")
            for op in p["stateOperators"]
        )

    write("b1.parquet", [(1, 3600, 1, "signup"), (2, 5400, 1, "purchase"),
                         (3, 3600, 2, "purchase")])
    p1 = run()
    assert state(p1, "numRowsRemoved") == 0
    assert outer_rows() == [], "outer row emitted before watermark passed its window"

    write("b2.parquet", [(4, 12 * 3600, 3, "signup")])
    p2 = run()

    assert state(p2, "numRowsRemoved") >= 1, "outer flush not counted as removal"
    totals = [
        op["numRowsTotal"]
        for p in p2
        if p.get("stateOperators")
        for op in p["stateOperators"]
    ]
    assert max(totals) >= 4, f"state never held all rows: {totals}"
    assert totals[-1] == 1, f"state retained beyond watermark: {totals}"
    flushed = outer_rows()
    assert [r.purchase_event_id for r in flushed] == [3], flushed


def test_stream_import_exactly_once_survives_batch_replay(spark, tmp_path):
    """foreachBatch is at-least-once by itself: if the driver dies
    after the sink write but before the streaming commit, the batch is
    RE-RUN with the same batch_id on restart.  write_idempotent makes
    the pair (rows, ledger row) one sink transaction, so the replay is
    skipped.  Simulated here by deleting the last checkpoint commit
    file — Spark then replays the final batch from its recorded
    offsets against a sink that already applied it."""
    import glob

    d = str(tmp_path / "eo_in")
    os.makedirs(d)
    db = str(tmp_path / "eo.duckdb")
    ckpt = str(tmp_path / "eo_ckpt")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE ev (event_id BIGINT, user_id BIGINT, event_type VARCHAR)")
    con.close()

    def run():
        stream = events_stream(spark, d).select("event_id", "user_id", "event_type")
        stream_import(
            stream, DuckDbSink(db), "ev", checkpoint=ckpt, exactly_once=True
        )

    def counts():
        con = duckdb.connect(db)
        n = con.execute("SELECT COUNT(*), COUNT(DISTINCT event_id) FROM ev").fetchone()
        con.close()
        return n

    shutil.copy(
        os.path.join(SF_SMOKE, "events.parquet"), os.path.join(d, "b1.parquet")
    )
    run()
    n1, d1 = counts()
    assert n1 == d1 > 0

    # a second file -> batch 1
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_704_067_200_000_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10**9 + i for i in range(7)], pa.int64()),
                "ts": pa.array([base // 1000] * 7, pa.timestamp("us")),
                "user_id": pa.array(list(range(7)), pa.int64()),
                "event_type": pa.array(["click"] * 7, pa.string()),
                "value": pa.array([1.0] * 7, pa.float64()),
                "props": pa.array(["{}"] * 7, pa.string()),
            }
        ),
        os.path.join(d, "b2.parquet"),
    )
    run()
    n2, d2 = counts()
    assert n2 == d2 == n1 + 7

    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    os.remove(commits[-1])  # forget the last commit -> forces replay
    crc = os.path.join(  # and its checksum sidecar, or the rewrite
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )  # is flagged as a concurrent checkpoint modification
    if os.path.exists(crc):
        os.remove(crc)
    run()
    n3, d3 = counts()
    assert (n3, d3) == (n2, d2), "replayed batch was applied twice"


def test_streaming_neardup_screen_matches_batch(spark, tmp_path):
    """Stream-static near-dup screen: streaming the arriving slice of
    documents against a static banded simhash index must produce
    exactly the rows of the batch gate query dedup_simhash_incremental
    (same operator, stream-static join, no state store)."""
    import shutil as _sh

    from parquet_to_sql_spark.operators.dedup import simhash_band_index
    from parquet_to_sql_spark.streaming import (
        documents_stream,
        neardup_screen_stream,
    )

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    _sh.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    index = simhash_band_index(
        docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", bits=24, radius=1
    )
    stream = documents_stream(spark, d).filter(F.col("doc_id") % 5 == 0)
    run_to_memory(neardup_screen_stream(stream, index), "neardup_out", "append")
    got = sorted(
        (r.new_id, r.corpus_id, r.hamming)
        for r in spark.sql("SELECT * FROM neardup_out").collect()
    )
    from parquet_to_sql_spark.queries.registry import all_queries

    want = sorted(
        (r.new_id, r.corpus_id, r.hamming)
        for r in all_queries()["dedup_simhash_incremental"].build(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_ewma_bit_exact_vs_batch(spark, events_dir):
    """The stateful streaming EWMA must be BIT-IDENTICAL to the batch
    ev_ewma_user_value fold (same (ts, event_id) order, Python float
    is IEEE double, alpha 0.25/0.75 exact binary fractions)."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import user_value_ewma

    stream = events_stream(spark, events_dir)
    run_to_memory(user_value_ewma(stream), "ewma_out", "update")
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    want = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in all_queries()["ev_ewma_user_value"].build(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_ewma_state_carries_across_batches(spark, events_dir, tmp_path):
    """Two availableNow runs over one checkpoint: the second run folds
    NEW events on top of the saved (n, ewma) state — counts add up and
    the ewma changes, proving state is the scalar pair, not a replay
    of history."""
    import pandas as pd

    from parquet_to_sql_spark.streaming import user_value_ewma

    ckpt = str(tmp_path / "ewma_ckpt")

    def run_once():
        # memory sink can't recover a checkpoint; foreachBatch can
        out: dict = {}

        def collect_batch(batch_df, batch_id):
            for r in batch_df.collect():
                out[r.user_id] = (r.n_events, r.ewma_value)

        stream = events_stream(spark, events_dir)
        q = (
            user_value_ewma(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    r1 = run_once()
    # second file: one late event per known user, far in the future
    users = sorted(r1)[:3]
    newer = pd.DataFrame(
        {
            "event_id": [10_000_001 + i for i in range(len(users))],
            "ts": pd.to_datetime("2031-01-01 00:00:00"),
            "user_id": users,
            "event_type": "purchase",
            "value": 100.0,
            "props": "{}",
        }
    )
    batch = load_table(spark, SF_SMOKE, "events")
    spark.createDataFrame(newer, schema=batch.schema).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    r2 = run_once()
    assert set(r2) == set(users), "run 2 must update only users with new events"
    for u in users:
        n1, e1 = r1[u]
        n2, e2 = r2[u]
        assert n2 == n1 + 1
        assert e2 == 0.25 * 100.0 + 0.75 * e1  # one more fold step


def test_streaming_contamination_screen_matches_batch(spark, tmp_path):
    """Stream-static decontamination: streaming the training slice
    against the static benchmark shingle index must produce exactly
    the batch screen's hit rows, and rolling the streamed hits up per
    doc must reproduce the oracle-checked text_contamination_check
    result."""
    import shutil as _sh

    from parquet_to_sql_spark.operators.text import (
        contamination_index,
        contamination_screen,
    )
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import (
        contamination_screen_stream,
        documents_stream,
    )

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    _sh.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    index = contamination_index(
        docs.filter(F.col("doc_id") % 7 == 0), "doc_id", "text", n=5
    )
    stream = documents_stream(spark, d).filter(F.col("doc_id") % 7 != 0)
    run_to_memory(
        contamination_screen_stream(stream, index), "contam_out", "append"
    )
    got = sorted(
        (r.doc_id, r.n_shingles, r.h)
        for r in spark.sql("SELECT * FROM contam_out").collect()
    )
    want = sorted(
        (r.doc_id, r.n_shingles, r.h)
        for r in contamination_screen(
            docs.filter(F.col("doc_id") % 7 != 0), index, "doc_id", "text", n=5
        ).collect()
    )
    assert got == want and len(got) > 0

    # per-doc rollup of streamed hits == the oracle-checked gate query
    rolled = {
        (r.doc_id, r.n_shingles, r.n_overlap)
        for r in spark.sql(
            "SELECT doc_id, n_shingles, COUNT(*) AS n_overlap "
            "FROM contam_out GROUP BY doc_id, n_shingles"
        ).collect()
    }
    gate = {
        (r.doc_id, r.n_shingles, r.n_overlap)
        for r in all_queries()["text_contamination_check"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert rolled == gate


def test_streaming_keyword_screen_matches_batch(spark, tmp_path):
    """The streaming keyword screen must emit exactly the rows of the
    batch keyword query's filter stage (same keyword_hits operator,
    stateless, append mode)."""
    import shutil as _sh

    from parquet_to_sql_spark.operators.text import keyword_hits
    from parquet_to_sql_spark.streaming import (
        documents_stream,
        keyword_screen_stream,
    )

    d = str(tmp_path / "docs_kw")
    os.makedirs(d)
    _sh.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    stream = documents_stream(spark, d)
    run_to_memory(keyword_screen_stream(stream), "kw_out", "append")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM kw_out").collect())
    docs = load_table(spark, SF_SMOKE, "documents")
    want = sorted(
        tuple(r)
        for r in keyword_hits(docs, "doc_id", "text", ("spark", "join", "window")).collect()
    )
    assert got == want and len(got) > 0


def test_stream_import_exactly_once_requires_capable_sink(spark):
    """exactly_once with a sink lacking write_idempotent must fail at
    call time, not inside the first micro-batch."""
    from parquet_to_sql_spark.sinks.files import FileSink
    from parquet_to_sql_spark.streaming import stream_import

    with pytest.raises(ValueError, match="write_idempotent"):
        stream_import(
            spark.readStream.format("rate").load(),
            FileSink("/tmp/nowhere"),
            "t",
            checkpoint="/tmp/nowhere_ckpt",
            exactly_once=True,
        )


def test_streaming_ewma_null_value_resets_like_batch(spark, tmp_path):
    """A NULL value must null the accumulator and reseed on the next
    non-null (the JVM fold's semantics), never latch NaN forever."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7, "purchase", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 7, "purchase", None, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 2, 0), 7, "purchase", 2.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 0, 3, 0), 7, "purchase", 4.0, "{}"),
    ]
    src = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d = str(tmp_path / "ev_null")
    src.coalesce(1).write.parquet(d)

    from parquet_to_sql_spark.streaming import events_stream, user_value_ewma

    run_to_memory(user_value_ewma(events_stream(spark, d)), "ewma_null_out", "update")
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in spark.sql("SELECT * FROM ewma_null_out").collect()
    }
    # fold: 1.0 -> NULL (reset) -> 2.0 (reseed) -> 0.25*4 + 0.75*2 = 2.5
    assert got[7] == (4, 2.5)


def test_chained_stateful_distinct_users_two_runs(spark, tmp_path):
    """Chained stateful operators (dedup -> windowed count) in append
    mode: nothing emits while windows are open; a later batch that
    advances the watermark finalizes the earlier windows with EXACT
    distinct counts (duplicates collapsed by the upstream dedup)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_to_sql_spark.streaming import events_stream, tumbling_distinct_users

    d = str(tmp_path / "chain_in")
    out = str(tmp_path / "chain_out")
    ckpt = str(tmp_path / "chain_ckpt")
    os.makedirs(d)
    base = 1_704_067_200_000_000  # 2024-01-01 00:00 in us

    def write(name, rows):  # (event_id, t_seconds, user_id)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [base + r[1] * 10**6 for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                    "event_type": pa.array(["click"] * len(rows), pa.string()),
                    "value": pa.array([1.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            os.path.join(d, name),
        )

    def run_once():
        q = (
            tumbling_distinct_users(events_stream(spark, d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # hour 0: users 1,1,2 (dup collapses to 2 distinct); hour 1: user 3
    write("a.parquet", [(1, 60, 1), (2, 120, 1), (3, 180, 2), (4, 3660, 3)])
    run_once()
    first = spark.read.schema("window_start timestamp, n_users long").parquet(out)
    assert first.count() == 0, "open windows must not emit in append mode"

    # hour 12 advances the watermark to 10h -> hours 0 and 1 finalize
    write("b.parquet", [(5, 12 * 3600, 9)])
    run_once()
    got = {
        (r.window_start.hour, r.n_users)
        for r in spark.read.schema(
            "window_start timestamp, n_users long"
        ).parquet(out).collect()
    }
    assert got == {(0, 2), (1, 1)}


def test_nanos_annotated_events_batch_and_stream_agree(spark, tmp_path):
    """A TIMESTAMP(NANOS)-annotated events file (the round-1 fixture
    shape) must read through BOTH the batch catalog path and
    events_stream to the same session-UTC event times — with the
    nanosAsLong conf set, the footer probe sees `ts` as bigint and the
    stream must apply the same nanos->micros truncation as
    catalog.load_table (VERDICT r03 item #2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "nanos_sf")
    os.makedirs(sf_dir)
    base_ns = 1_700_000_000 * 10**9
    # second event carries sub-microsecond nanos that truncation drops
    ts_ns = [base_ns, base_ns + 3_600 * 10**9 + 1_234_567_891]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts_ns, pa.timestamp("ns")),
                "user_id": pa.array([7, 8], pa.int64()),
                "event_type": pa.array(["click", "view"], pa.string()),
                "value": pa.array([1.0, 2.0], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        ),
        os.path.join(sf_dir, "events.parquet"),
        store_schema=False,  # force readers onto the NANOS annotation
    )

    batch = load_table(spark, sf_dir, "events")
    assert dict(batch.dtypes)["ts"] == "timestamp"
    batch_ts = {r.event_id: r.ts for r in batch.collect()}
    # nanos truncated (not rounded) to micros, session-UTC epoch
    assert batch_ts[2].microsecond == 234_567

    stream = events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    run_to_memory(
        stream.select("event_id", "ts"), "nanos_stream_out", "append"
    )
    stream_ts = {
        r.event_id: r.ts
        for r in spark.sql("SELECT * FROM nanos_stream_out").collect()
    }
    assert stream_ts == batch_ts


def test_stream_schema_probe_masks_only_missing_input(spark, tmp_path):
    """The footer probe treats ONLY missing-path / no-files as 'no
    input yet'; a corrupt file must raise at declaration time instead
    of silently starting the stream with a guessed schema (ADVICE
    r03)."""
    from parquet_to_sql_spark.streaming.pipeline import documents_stream

    # empty dir -> benign fallback schema (stream idles until data)
    empty = str(tmp_path / "empty_dir")
    os.makedirs(empty)
    assert documents_stream(spark, empty) is not None

    # missing path -> clean PATH_NOT_FOUND (Spark's own file source
    # rejects nonexistent dirs at declaration; the probe must not turn
    # that into anything murkier)
    from pyspark.errors import AnalysisException

    missing = str(tmp_path / "never_made")
    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        documents_stream(spark, missing)

    # a corrupt parquet footer -> the real error propagates
    corrupt_dir = str(tmp_path / "corrupt")
    os.makedirs(corrupt_dir)
    with open(os.path.join(corrupt_dir, "bad.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet file")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        documents_stream(spark, corrupt_dir)


def test_streaming_bm25_screen_matches_batch(spark, tmp_path):
    """Streaming BM25 score-at-ingest == the batch scorer on the same
    rows: same operator functions, static broadcast stats, so scores
    are bit-identical (exact integer arithmetic end to end)."""
    from parquet_to_sql_spark.operators.text import (
        bm25_corpus_stats,
        bm25_doc_features,
        bm25_rational_scores,
    )
    from parquet_to_sql_spark.streaming.pipeline import (
        bm25_screen_stream,
        documents_stream,
    )

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    shutil.copy(
        os.path.join(SF_SMOKE, "documents.parquet"),
        os.path.join(d, "part0.parquet"),
    )

    terms = ("spark", "join", "window")
    corpus = load_table(spark, SF_SMOKE, "documents")
    feats = bm25_doc_features(corpus, "doc_id", "text", terms)
    stats = bm25_corpus_stats(feats, terms)
    want = {
        (r.doc_id, r.score_ppm)
        for r in bm25_rational_scores(feats, terms, stats).collect()
    }
    assert want, "fixture must produce at least one scored doc"

    run_to_memory(
        bm25_screen_stream(documents_stream(spark, d), stats, terms)
        .select("doc_id", "score_ppm"),
        "bm25_stream_out",
        "append",
    )
    got = {
        (r.doc_id, r.score_ppm)
        for r in spark.sql("SELECT * FROM bm25_stream_out").collect()
    }
    assert got == want


def test_span_screen_stream_equals_batch_and_rolls_up_to_spans(spark, tmp_path):
    """The streaming repeated-span screen (stream-static gram join)
    must emit exactly the batch twin's match rows, and the consumer's
    islands rollup over the streamed matches must find the planted
    shared span with the same (start, length) arithmetic as the batch
    detector."""
    from parquet_to_sql_spark.operators.dedup import (
        reference_span_index,
        repeated_span_matches,
    )
    from parquet_to_sql_spark.streaming import documents_stream, span_screen_stream

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    shutil.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    ref = docs.filter(F.col("doc_id") % 9 == 0)
    index = reference_span_index(ref, "doc_id", "text", k=6).localCheckpoint()

    stream = documents_stream(spark, d).filter(F.col("doc_id") % 9 != 0)
    run_to_memory(span_screen_stream(stream, index, k=6), "span_out", "append")
    got = sorted(
        (r.ref_doc, r.new_doc, r.ref_pos, r.d)
        for r in spark.sql("SELECT * FROM span_out").collect()
    )
    want = sorted(
        (r.ref_doc, r.new_doc, r.ref_pos, r.d)
        for r in repeated_span_matches(
            docs.filter(F.col("doc_id") % 9 != 0), index, "doc_id", "text", k=6
        ).collect()
    )
    assert got == want and len(got) > 0

    # consumer-side islands rollup: maximal spans from streamed matches
    spans = {
        (r.ref_doc, r.new_doc, r.start_ref, r.span_tokens)
        for r in spark.sql(
            """
            SELECT ref_doc, new_doc, MIN(ref_pos) AS start_ref,
                   COUNT(*) + 5 AS span_tokens
            FROM (
              SELECT ref_doc, new_doc, d, ref_pos,
                     ref_pos - row_number() OVER (
                       PARTITION BY ref_doc, new_doc, d ORDER BY ref_pos
                     ) AS island
              FROM span_out
            )
            GROUP BY ref_doc, new_doc, d, island
            HAVING COUNT(*) + 5 >= 12
            """
        ).collect()
    }
    # cross-check against the symmetric batch detector restricted to
    # (ref, non-ref) pairs — same arithmetic, so spans must agree
    from parquet_to_sql_spark.operators.dedup import repeated_spans

    batch = repeated_spans(docs, "doc_id", "text", k=6, min_tokens=12).collect()
    ref_ids = {r.doc_id for r in ref.select("doc_id").collect()}
    batch_pairs = set()
    for r in batch:
        if (r.doc1 in ref_ids) != (r.doc2 in ref_ids):
            if r.doc1 in ref_ids:
                batch_pairs.add((r.doc1, r.doc2, r.start1, r.span_tokens))
            else:
                batch_pairs.add((r.doc2, r.doc1, r.start2, r.span_tokens))
    assert spans == batch_pairs
    assert len(spans) > 0  # non-vacuous: 12 cross ref/non-ref spans at sf0.001


def test_streaming_transitions_match_batch(spark, events_dir):
    """The stateful transition emitter, rolled up to the matrix, must
    equal the batch lag-window query's counts exactly."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import event_transitions_stream

    stream = events_stream(spark, events_dir)
    run_to_memory(event_transitions_stream(stream), "trans_out", "append")
    got = {
        (r.prev_type, r.next_type): r.n
        for r in spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n FROM trans_out GROUP BY 1, 2"
        ).collect()
    }
    want = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in all_queries()["ev_event_transitions"].build(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_transitions_span_batch_boundary(spark, events_dir, tmp_path):
    """Two availableNow runs over one checkpoint: the second run's new
    events must pair with each user's LAST event from run 1 — the
    cross-batch transition a stateless within-batch lag would lose."""
    import pandas as pd

    from parquet_to_sql_spark.streaming import event_transitions_stream

    ckpt = str(tmp_path / "trans_ckpt")

    def run_once():
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        stream = events_stream(spark, events_dir)
        q = (
            event_transitions_stream(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    r1 = run_once()
    assert len(r1) > 0
    # each chosen user's true last event type from the original data
    batch = _batch_events(spark)
    import pyspark.sql.functions as F

    last_types = {
        r.user_id: r.lt
        for r in batch.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("lt"))
        .collect()
    }
    users = sorted(last_types)[:3]
    newer = pd.DataFrame(
        {
            "event_id": [20_000_001 + i for i in range(len(users))],
            "ts": pd.to_datetime("2031-06-01 00:00:00"),
            "user_id": users,
            "event_type": "signup",
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(newer, schema=batch.schema).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    r2 = run_once()
    got = {(r.user_id, r.prev_type, r.next_type) for r in r2}
    want = {(u, last_types[u], "signup") for u in users}
    assert got == want


def test_streaming_classifier_screen_matches_batch(spark, tmp_path):
    """The stateless streaming classifier (row-local fold, literal
    model map) must score every arriving document exactly like the
    batch formulation (explode + broadcast weight join + rollup) —
    two plans, one model, identical integers."""
    import shutil as _sh

    from parquet_to_sql_spark.operators.text import hash_feature_weights
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import (
        classifier_screen_stream,
        documents_stream,
    )

    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    _sh.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    stream = documents_stream(spark, d)
    run_to_memory(
        classifier_screen_stream(stream, hash_feature_weights(spark)),
        "cls_out",
        "append",
    )
    got = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in spark.sql("SELECT * FROM cls_out").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in all_queries()["text_hash_feature_classify"].build(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_classifier_screen_partial_model_matches_batch(spark, tmp_path):
    """A trained model need not cover all 256 buckets.  The batch
    inner join silently drops unmatched tokens from both n_tokens and
    score (and drops a doc whose tokens ALL miss the model); the
    streaming fold must reproduce exactly that, instead of letting one
    NULL element_at lookup poison the whole sum while n_tokens keeps
    counting everything."""
    import shutil as _sh

    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.operators.text import (
        hash_feature_scores,
        hash_feature_weights,
    )
    from parquet_to_sql_spark.streaming import (
        classifier_screen_stream,
        documents_stream,
    )

    weights = hash_feature_weights(spark).where("bkt % 3 != 0")  # 2/3 coverage
    d = str(tmp_path / "docs_part_in")
    os.makedirs(d)
    _sh.copy(
        os.path.join(SF_SMOKE, "documents.parquet"), os.path.join(d, "part0.parquet")
    )
    stream = documents_stream(spark, d)
    run_to_memory(
        classifier_screen_stream(stream, weights), "cls_part_out", "append"
    )
    got = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in spark.sql("SELECT * FROM cls_part_out").collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    want = {
        r.doc_id: (r.n_tokens, r.score, r.keep)
        for r in hash_feature_scores(docs, "doc_id", "text", weights).collect()
    }
    assert got == want and len(got) > 0
    # non-vacuous: the coverage gap actually dropped tokens somewhere
    full = {
        r.doc_id: r.n_tokens
        for r in hash_feature_scores(
            docs, "doc_id", "text", hash_feature_weights(spark)
        ).collect()
    }
    assert any(got[i][0] < full[i] for i in got)


def test_streaming_transitions_ttl_evicts_idle_state(spark, tmp_path):
    """event_transitions_stream(ttl_minutes=...): a user idle past the
    TTL horizon has their last_type state EVICTED once the watermark
    passes last-seen + TTL, so their next event starts a fresh chain
    instead of pairing across the idle gap — bounded state for
    long-running streams with churning users.  The default NoTimeout
    variant over the same data DOES pair across the gap (the retention
    trade-off, asserted as the contrast at the end)."""
    import pandas as pd

    batch_schema = _batch_events(spark).schema
    d = str(tmp_path / "ttl_events_in")
    os.makedirs(d)
    ckpt = str(tmp_path / "ttl_ckpt")

    def add(eid, ts, uid, etype):
        pdf = pd.DataFrame(
            {
                "event_id": [eid],
                "ts": pd.to_datetime([ts]),
                "user_id": [uid],
                "event_type": [etype],
                "value": [1.0],
                "props": ["{}"],
            }
        )
        spark.createDataFrame(pdf, schema=batch_schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    def run_once(ck, **kw):
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        from parquet_to_sql_spark.streaming import event_transitions_stream

        q = (
            event_transitions_stream(events_stream(spark, d), **kw)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.user_id, r.prev_type, r.next_type) for r in rows}

    add(1, "2030-01-01 10:00:00", 1, "click")
    add(2, "2030-01-01 10:05:00", 1, "view")
    add(3, "2030-01-01 10:00:00", 2, "click")
    r1 = run_once(ckpt, ttl_minutes=30, watermark="0 seconds")
    assert r1 == {(1, "click", "view")}
    # eviction is WATERMARK-driven, not wall-gap-driven: user 2's
    # state is still live when this batch runs (watermark is only at
    # 10:05), so the 2-hour-gap pair still emits — lag semantics
    add(4, "2030-01-01 12:00:00", 2, "purchase")
    r2 = run_once(ckpt, ttl_minutes=30, watermark="0 seconds")
    assert r2 == {(2, "click", "purchase")}
    # this batch's start watermark (12:00) is past user 1's timeout
    # (10:05 + 30 min): their idle state evicts silently here
    add(5, "2030-01-01 12:30:00", 3, "click")
    r3 = run_once(ckpt, ttl_minutes=30, watermark="0 seconds")
    assert r3 == set()
    # evicted: user 1's return does NOT pair across the idle gap
    add(6, "2030-01-01 13:00:00", 1, "signup")
    r4 = run_once(ckpt, ttl_minutes=30, watermark="0 seconds")
    assert r4 == set()

    # contrast: default NoTimeout over the same final data keeps every
    # user's last_type forever and DOES emit the cross-gap pair
    r_all = run_once(str(tmp_path / "nottl_ckpt"))
    assert (1, "view", "signup") in r_all


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing state functions'
    timeout arithmetic without a streaming query."""

    def __init__(self, watermark_ms: int, value=None):
        self._wm = watermark_ms
        self._value = value
        self.hasTimedOut = False
        self.timeout_set: list[int] = []

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts_ms: int):
        # mirror Spark's validation (GroupStateImpl): a timestamp at
        # or behind the current watermark is an IllegalArgumentException
        # that fails the whole streaming query
        if ts_ms <= self._wm:
            raise ValueError(
                f"Timeout timestamp ({ts_ms}) cannot be earlier than the "
                f"current watermark ({self._wm})"
            )
        self.timeout_set.append(ts_ms)


def test_transitions_ttl_clamps_timeout_to_watermark():
    """ADVICE r07: a batch whose ts_max + TTL lands behind the
    operator's current watermark used to call setTimeoutTimestamp
    with a stale timestamp — an IllegalArgumentException that kills
    the whole query.  Spark 4 DOES filter late input rows at this
    operator's boundary, but under chained stateful operators the
    late-event filter and the eviction validation use two DIFFERENT
    watermarks (SPARK-42376 propagation), so a row can pass the
    filter while its TTL horizon is already behind the eviction
    watermark.  The fix clamps to watermark + 1 ms; this unit test
    pins the clamp directly against a GroupState stand-in that
    mirrors Spark's validation."""
    import pandas as pd

    from parquet_to_sql_spark.streaming.pipeline import _make_transitions_fn

    ttl_us = 30 * 60 * 1_000_000
    wm_ms = int(pd.Timestamp("2030-01-01 10:00:00").value // 1_000_000)
    state = _FakeGroupState(wm_ms, value=("click",))
    batch = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2030-01-01 09:00:00"]),  # + TTL < wm
            "event_id": [2],
            "event_type": ["view"],
        }
    )
    out = pd.concat(list(_make_transitions_fn(ttl_us)((1,), iter([batch]), state)))
    # no exception, pair emitted, timeout clamped to wm + 1
    assert list(zip(out["prev_type"], out["next_type"])) == [("click", "view")]
    assert state.timeout_set == [wm_ms + 1]
    # and a NON-late batch still gets the exact ts_max + TTL horizon
    state2 = _FakeGroupState(wm_ms, value=("click",))
    late_ok = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2030-01-01 11:00:00"]),
            "event_id": [3],
            "event_type": ["buy"],
        }
    )
    list(_make_transitions_fn(ttl_us)((1,), iter([late_ok]), state2))
    expected = int(pd.Timestamp("2030-01-01 11:00:00").value // 1_000_000) + (
        ttl_us // 1000
    )
    assert state2.timeout_set == [expected]


def test_session_fn_clamps_timeout_to_watermark():
    """Same clamp for the EventTimeTimeout sessionizer (the duplicated
    pattern ADVICE r07 called out): a batch whose gap horizon is
    behind the eviction watermark must not raise, and the open
    session's (start, end, n) arithmetic is unchanged by the clamp."""
    import pandas as pd

    from parquet_to_sql_spark.streaming.pipeline import _session_fn

    wm_ms = int(pd.Timestamp("2030-01-01 12:00:00").value // 1_000_000)
    state = _FakeGroupState(wm_ms)
    batch = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2030-01-01 09:00:00"]),  # + 30 min < wm
            "event_id": [1],
        }
    )
    list(_session_fn((2,), iter([batch]), state))
    assert state.timeout_set == [wm_ms + 1]
    s, e, n = state.get
    assert n == 1 and s == e == int(
        pd.Timestamp("2030-01-01 09:00:00").value // 1000
    )


def test_streaming_sessions_timeout_eviction_matches_batch(spark, events_dir, tmp_path):
    """The EventTimeTimeout sessionizer: run 1 emits every session
    that CLOSED inside the batch (a later event >= 30 min after it);
    run 2 advances the watermark with a far-future event, which must
    flush every user's held-open last session via state.hasTimedOut +
    remove.  The union of emissions equals the built-in session_window
    batch query exactly on (user_id, session_start, n_events)."""
    import pandas as pd

    from parquet_to_sql_spark.streaming import user_sessions_stream

    ckpt = str(tmp_path / "sess_ckpt")

    def run_once():
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        stream = events_stream(spark, events_dir)
        q = (
            user_sessions_stream(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return rows

    r1 = run_once()
    assert len(r1) > 0  # intra-batch closed sessions emit immediately

    batch = _batch_events(spark)
    # a single far-future event pushes the GLOBAL watermark past every
    # held session's gap horizon
    newer = pd.DataFrame(
        {
            "event_id": [30_000_001],
            "ts": pd.to_datetime("2032-01-01 00:00:00"),
            "user_id": [batch.agg(F.min("user_id")).collect()[0][0]],
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(newer, schema=batch.schema).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    r2 = run_once()
    assert len(r2) > 0  # the timed-out flush happened

    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in r1 + r2
        if r.session_start.year < 2032  # the new event's own open session never emits
    )
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in (
            batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        ).collect()
    )
    assert got == want and len(got) > 100


def test_streaming_asof_enrich_matches_batch(spark, events_dir):
    """The O(1)-state streaming as-of fold must equal the batch
    union-and-window as-of join (join_asof_purchases) row for row —
    including purchase-ts ties resolved to the highest purchase id
    and purchases enriching themselves."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import asof_enrich_stream

    stream = events_stream(spark, events_dir)
    run_to_memory(asof_enrich_stream(stream), "asof_out", "append")
    got = {
        r.event_id: (r.purchase_event_id, r.purchase_ts)
        for r in spark.sql("SELECT * FROM asof_out").collect()
    }
    want = {
        r.event_id: (r.purchase_event_id, r.purchase_ts)
        for r in all_queries()["join_asof_purchases"]
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert got == want and len(got) > 100


def test_streaming_asof_enrich_spans_batch_boundary(spark, events_dir, tmp_path):
    """An event arriving in run 2 must enrich against the user's last
    purchase from run 1 — the carried state is the whole point."""
    import pandas as pd

    from parquet_to_sql_spark.streaming import asof_enrich_stream

    ckpt = str(tmp_path / "asof_ckpt")

    def run_once():
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            asof_enrich_stream(events_stream(spark, events_dir))
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    r1 = run_once()
    assert len(r1) > 0
    batch = _batch_events(spark)
    last_purchase = {
        r.user_id: (r.p_id, r.p_ts)
        for r in batch.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", F.struct("ts", "event_id")).alias("p_id"),
            F.max("ts").alias("p_ts"),
        )
        .collect()
    }
    users = sorted(last_purchase)[:3]
    newer = pd.DataFrame(
        {
            "event_id": [40_000_001 + i for i in range(len(users))],
            "ts": pd.to_datetime("2031-06-01 00:00:00"),
            "user_id": users,
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(newer, schema=batch.schema).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    r2 = run_once()
    got = {r.event_id: r.purchase_event_id for r in r2}
    for i, u in enumerate(users):
        eid = 40_000_001 + i
        assert got.get(eid) == last_purchase[u][0]


def test_streaming_quota_admit_matches_batch_window(spark, events_dir):
    """Per-key admission quota vs the batch row_number formulation:
    each user's first 10 events in (ts, event_id) order admit with
    their rank, everything later drops."""
    from pyspark.sql import Window

    from parquet_to_sql_spark.streaming import quota_admit_stream

    stream = events_stream(spark, events_dir)
    run_to_memory(quota_admit_stream(stream, cap=10), "quota_out", "append")
    got = {
        (r.user_id, r.event_id): r.admit_rank
        for r in spark.sql("SELECT * FROM quota_out").collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r.user_id, r.event_id): r.rn
        for r in _batch_events(spark)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    assert got == want and len(got) > 100


def test_streaming_quota_admit_matches_gate_query(spark, events_dir):
    """The at-ingest quota stream and the ORACLE-CHECKED batch gate
    query (ev_quota_admission, cap 7 — VERDICT r07 #7's missing gate
    entry) admit exactly the same (user, event, rank) set, tying the
    streaming operator to driver-row evidence through its twin."""
    from parquet_to_sql_spark.queries.registry import all_queries
    from parquet_to_sql_spark.streaming import quota_admit_stream

    stream = events_stream(spark, events_dir)
    run_to_memory(quota_admit_stream(stream, cap=7), "quota_gate_out", "append")
    got = {
        (r.user_id, r.event_id, r.admit_rank)
        for r in spark.sql("SELECT * FROM quota_gate_out").collect()
    }
    want = {
        (r.user_id, r.event_id, r.admit_rank)
        for r in all_queries()["ev_quota_admission"].build(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 50


def test_streaming_quota_carries_across_runs(spark, events_dir, tmp_path):
    """A key whose quota filled in run 1 admits NOTHING in run 2 —
    the counter state is the whole point; a fresh key in run 2 starts
    its own quota at rank 1."""
    import pandas as pd

    from parquet_to_sql_spark.streaming import quota_admit_stream

    ckpt = str(tmp_path / "quota_ckpt")

    def run_once():
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            quota_admit_stream(events_stream(spark, events_dir), cap=3)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    r1 = run_once()
    batch = _batch_events(spark)
    counts = {
        r.user_id: r.n
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    full_user = next(u for u in sorted(counts) if counts[u] >= 3)
    newer = pd.DataFrame(
        {
            "event_id": [50_000_001, 50_000_002],
            "ts": pd.to_datetime("2031-06-01 00:00:00"),
            "user_id": [full_user, 999_999_999],
            "event_type": "click",
            "value": 1.0,
            "props": "{}",
        }
    )
    spark.createDataFrame(newer, schema=batch.schema).coalesce(1).write.mode(
        "append"
    ).parquet(events_dir)
    r2 = run_once()
    by_eid = {r.event_id: r for r in r2}
    assert 50_000_001 not in by_eid  # quota filled in run 1
    assert by_eid[50_000_002].admit_rank == 1  # fresh key starts fresh


def test_streaming_countmin_matches_batch_sketch(spark, tmp_path):
    """countmin_stream after consuming all input equals the batch
    Count-Min table (the cm relation inside the oracle-checked
    agg_countmin_words) cell for cell — both run the shared
    countmin_cells emission, so the streamed sketch is probe-able
    with the batch estimate at any snapshot.  A second file landing
    mid-stream exercises the incremental update path."""
    import shutil

    import pandas as pd

    from parquet_to_sql_spark.functions.hashing import (
        char_fold_hash,
        countmin_cells,
    )
    from parquet_to_sql_spark.operators.text import ws_tokens
    from parquet_to_sql_spark.streaming import countmin_stream, documents_stream

    d = str(tmp_path / "cm_docs_in")
    os.makedirs(d)
    shutil.copy(
        os.path.join(SF_SMOKE, "documents.parquet"),
        os.path.join(d, "part0.parquet"),
    )

    def run_once(name):
        run_to_memory(countmin_stream(documents_stream(spark, d)), name,
                      "complete")
        return {
            (r.i, r.bucket): r.c
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    def batch_cm():
        docs = spark.read.parquet(d)
        return {
            (r.i, r.bucket): r.c
            for r in (
                docs.select(F.explode(ws_tokens(F.col("text"))).alias("word"))
                .select(
                    F.explode(
                        countmin_cells(char_fold_hash(F.col("word")))
                    ).alias("cell")
                )
                .groupBy("cell.i", "cell.bucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
                .collect()
            )
        }

    got1 = run_once("cm_out_1")
    assert got1 == batch_cm() and len(got1) > 100
    # incremental: new documents land; the re-run sketch equals the
    # batch sketch over the ENLARGED input
    extra = pd.DataFrame(
        {
            "doc_id": [9_000_001, 9_000_002],
            "text": ["the quick brown fox", "the the the lazy dog"],
            "lang": ["en", "en"],
            "source": ["src0", "src0"],
            "n_chars": [19, 20],
        }
    )
    spark.createDataFrame(
        extra, schema=spark.read.parquet(d).schema
    ).coalesce(1).write.mode("append").parquet(d)
    got2 = run_once("cm_out_2")
    assert got2 == batch_cm()
    # the sketch never shrinks and stays within its fixed footprint
    assert all(got2[k] >= got1.get(k, 0) for k in got2)
    assert len(got2) <= 4 * 1024


def test_rowlocal_minhash_signatures_equal_batch(spark):
    """The streaming-safe row-local signature path must be VALUE-
    identical to the batch explode+groupBy sketch for every fixture
    document (same fold hash, same permutation constants)."""
    from parquet_to_sql_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_rowlocal,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    want = {
        r.doc_id: tuple(r)[1:]
        for r in minhash_signatures(docs, "doc_id", "text", k=8, n=3).collect()
    }
    got = {
        r.doc_id: tuple(r)[1:]
        for r in minhash_signatures_rowlocal(
            docs, "doc_id", "text", k=8, n=3
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_minhash_screen_stream_matches_batch_probe(spark, tmp_path):
    """Streaming MinHash screen == the batch incremental screen on the
    same inputs: planted near-dups of base docs arrive on the stream,
    probe the stored band index, and the streamed match rows (after
    the consumer's DISTINCT pair collapse) equal
    minhash_screen_against_index exactly."""
    from parquet_to_sql_spark.operators.dedup import (
        minhash_band_index,
        minhash_screen_against_index,
    )
    from parquet_to_sql_spark.streaming.pipeline import (
        documents_stream,
        minhash_screen_stream,
    )

    base = load_table(spark, SF_SMOKE, "documents").limit(40).localCheckpoint()
    idx = minhash_band_index(base, "doc_id", "text", k=8, bands=4, n=3)
    idx = idx.localCheckpoint()  # static side, referenced by both runs

    # new slice: copies of the base docs under shifted ids (guaranteed
    # band collisions) + one unrelated doc
    new_docs = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        *[c for c in base.columns if c not in ("doc_id", "text")],
    ).unionByName(
        base.limit(1).select(
            F.lit(999999).alias("doc_id"),
            F.lit("totally unrelated replacement words only").alias("text"),
            *[c for c in base.columns if c not in ("doc_id", "text")],
        )
    )
    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    new_docs.coalesce(1).write.mode("overwrite").parquet(d)

    want = {
        (r.new_id, r.corpus_id)
        for r in minhash_screen_against_index(
            spark.read.parquet(d), idx, "doc_id", "text", k=8, bands=4, n=3
        ).collect()
    }
    assert want, "planted copies must collide with the stored index"

    run_to_memory(
        minhash_screen_stream(documents_stream(spark, d), idx, k=8, bands=4, n=3),
        "minhash_screen_out",
        "append",
    )
    got = {
        (r.new_id, r.corpus_id)
        for r in spark.sql(
            "SELECT DISTINCT new_id, corpus_id FROM minhash_screen_out"
        ).collect()
    }
    assert got == want


def _frontier_rows(ids_texts):
    """(host, doc_id, delay_ms) rows with the gate query's synth
    formulas (23 hosts, delays 500-1500 by host class)."""
    out = []
    for did in ids_texts:
        hn = did % 23
        out.append((f"h{hn}.example.com", did, 500 + (hn % 5) * 250))
    return out


def test_frontier_schedule_stream_matches_batch_window(spark, tmp_path):
    """Streamed politeness slots == row_number() over the same rows:
    the stateful scheduler in one availableNow pass must reproduce
    the batch window formula exactly (slot per host in doc-id order,
    fetch_at = (slot-1) * delay)."""
    from pyspark.sql import Window

    from parquet_to_sql_spark.streaming import frontier_schedule_stream

    d = str(tmp_path / "frontier_in")
    os.makedirs(d)
    df = spark.createDataFrame(
        _frontier_rows(range(60)), "host string, doc_id long, delay_ms long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(d)

    w = Window.partitionBy("host").orderBy("doc_id")
    want = {
        (r.host, r.doc_id, r.slot, r.fetch_at_ms)
        for r in df.withColumn("slot", F.row_number().over(w).cast("long"))
        .withColumn("fetch_at_ms", (F.col("slot") - 1) * F.col("delay_ms"))
        .select("host", "doc_id", "slot", "fetch_at_ms")
        .collect()
    }

    stream = spark.readStream.schema(
        "host string, doc_id long, delay_ms long"
    ).parquet(d)
    from parquet_to_sql_spark.streaming import run_to_memory

    run_to_memory(
        frontier_schedule_stream(stream), "frontier_out", "append"
    )
    got = {
        (r.host, r.doc_id, r.slot, r.fetch_at_ms)
        for r in spark.sql("SELECT * FROM frontier_out").collect()
    }
    assert got == want


def test_frontier_schedule_stream_carries_slots_across_runs(spark, tmp_path):
    """A host's slot counter survives the checkpoint: URLs arriving
    in run 2 continue the host's FIFO where run 1 left off (no
    politeness slot double-booked), while a new host starts at 1."""
    from parquet_to_sql_spark.streaming import frontier_schedule_stream

    d = str(tmp_path / "frontier_in2")
    os.makedirs(d)
    ckpt = str(tmp_path / "frontier_ckpt")
    schema = "host string, doc_id long, delay_ms long"

    def run_once():
        rows: list = []

        def collect_batch(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            frontier_schedule_stream(
                spark.readStream.schema(schema).parquet(d)
            )
            .writeStream.foreachBatch(collect_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return rows

    spark.createDataFrame(
        [("hA", 1, 500), ("hA", 2, 500), ("hB", 3, 750)], schema
    ).coalesce(1).write.mode("append").parquet(d)
    r1 = {r.doc_id: r for r in run_once()}
    assert (r1[1].slot, r1[2].slot, r1[3].slot) == (1, 2, 1)

    spark.createDataFrame(
        [("hA", 10, 500), ("hC", 11, 1000)], schema
    ).coalesce(1).write.mode("append").parquet(d)
    r2 = {r.doc_id: r for r in run_once()}
    assert set(r2) == {10, 11}
    assert r2[10].slot == 3 and r2[10].fetch_at_ms == 1000  # hA continues
    assert r2[11].slot == 1 and r2[11].fetch_at_ms == 0  # hC starts fresh


def test_crawl_ingest_stream_matches_batch(spark, tmp_path):
    """Streaming crawl ingest == the oracle-checked batch gate query
    on the same doc ids: same shared operator, stateless, so the
    verdict rows must be identical."""
    from parquet_to_sql_spark.operators.crawl import ingest_warc_docs
    from parquet_to_sql_spark.streaming.pipeline import (
        crawl_ingest_stream,
        documents_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(30).localCheckpoint()
    d = str(tmp_path / "docs_in")
    os.makedirs(d)
    docs.coalesce(1).write.mode("overwrite").parquet(d)

    want = sorted(
        map(tuple, ingest_warc_docs(spark.read.parquet(d)).collect())
    )
    assert any(r[6] for r in want) and any(not r[6] for r in want), (
        "fixture must produce both keep and drop verdicts"
    )
    run_to_memory(
        crawl_ingest_stream(documents_stream(spark, d)),
        "crawl_ingest_out",
        output_mode="append",  # stateless screen: no aggregation
    )
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM crawl_ingest_out").collect())
    )
    assert got == want


def test_robots_screen_stream_matches_batch(spark, tmp_path):
    """Streaming robots admission == the batch row-local decision on
    the same URLs: same parsed rules array, same robots_decide fold,
    stateless — verdicts must be identical."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.operators.urls import (
        robots_decide,
        robots_star_rules,
    )
    from parquet_to_sql_spark.streaming.pipeline import robots_screen_stream

    txts = [
        (0, "User-agent: *\nDisallow: /a\nAllow: /a/b\n"),
        (1, "User-agent: *\nDisallow: /\n"),
        (2, "User-agent: badbot\nDisallow: /\n"),
        # r11: RFC 9309 special characters ride the same stream path
        (3, "User-agent: *\nDisallow: /*/c$\nAllow: /a/x\n"),
    ]
    host_rules = spark.createDataFrame(txts, "h long, txt string").select(
        "h", robots_star_rules(F.col("txt")).alias("rules")
    ).localCheckpoint()
    urls = spark.createDataFrame(
        [(h, p) for h in range(4) for p in ("/a/b/c", "/a/x", "/zzz")],
        "h long, path string",
    )
    d = str(tmp_path / "urls_in")
    os.makedirs(d)
    urls.coalesce(1).write.mode("overwrite").parquet(d)

    decision = robots_decide(F.col("path"), F.col("rules"))
    want = sorted(
        map(
            tuple,
            spark.read.parquet(d)
            .join(F.broadcast(host_rules), "h")
            .select(
                "h", "path",
                decision.getField("allowed").alias("allowed"),
                decision.getField("winning_prefix").alias("winning_prefix"),
            )
            .collect(),
        )
    )
    assert any(not r[2] for r in want) and any(r[2] for r in want)
    stream = (
        spark.readStream.schema("h long, path string").parquet(d)
    )
    run_to_memory(
        robots_screen_stream(stream, host_rules),
        "robots_screen_out",
        output_mode="append",
    )
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM robots_screen_out").collect())
    )
    assert got == want


def test_pii_scrub_stream_matches_batch(spark, tmp_path):
    """Streaming PII scrub == the batch projection on the same rows
    (same shared function, stateless)."""
    import pyspark.sql.functions as F

    from parquet_to_sql_spark.queries.pipelines import pii_scrub_projection
    from parquet_to_sql_spark.streaming.pipeline import pii_scrub_stream

    rows = [
        (1, "contact me at a.b@ex.com or 10.0.0.1 thanks"),
        (2, "clean text no pii at all"),
        (3, "call +1-555-1234 twice +1-555-9999 from 192.168.3.7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    d = str(tmp_path / "pii_in")
    os.makedirs(d)
    df.coalesce(1).write.mode("overwrite").parquet(d)

    want = sorted(map(tuple, pii_scrub_projection(spark.read.parquet(d)).collect()))
    assert any(r[1] or r[2] or r[3] for r in want)  # pii present
    stream = spark.readStream.schema("doc_id long, t string").parquet(d)
    run_to_memory(pii_scrub_stream(stream), "pii_scrub_out", output_mode="append")
    got = sorted(map(tuple, spark.sql("SELECT * FROM pii_scrub_out").collect()))
    assert got == want


def _write_crawl_shard(dirpath: str, shard: int, doc_ids: list[int]) -> None:
    from parquet_to_sql_spark.operators.crawl import synth_doc_html
    from parquet_to_sql_spark.operators.http import http_write_response
    from parquet_to_sql_spark.operators.warc import (
        warc_gzip_members,
        warc_write_record,
    )

    recs = []
    for did in doc_ids:
        status, reason = (
            (301, "Moved Permanently") if did % 7 == 5
            else (404, "Not Found") if did % 7 == 6
            else (200, "OK")
        )
        cs = "utf-8" if did % 2 == 0 else "iso-8859-1"
        msg = http_write_response(
            status, reason,
            [("Content-Type", f"text/html; charset={cs}")],
            synth_doc_html(did).encode(cs), chunked=did % 3 == 0,
        )
        url = f"http://ex.com/{did}"
        recs += [
            warc_write_record("request", url, b"GET /", f"q{did}"),
            warc_write_record("response", url, msg, f"r{did}"),
        ]
    with open(os.path.join(dirpath, f"shard-{shard}.warc.gz"), "wb") as f:
        f.write(warc_gzip_members(recs))


def test_crawl_files_stream_matches_batch_and_is_incremental(spark, tmp_path):
    """The FILE-level streaming twin: (1) a binaryFile file-source
    stream over a .warc.gz shard dir produces bit-identical rows to
    the shared batch operator on the same files; (2) with a
    checkpoint, a second availableNow run after a NEW shard lands
    emits ONLY that shard's rows — exactly-once per file across
    runs, the production tail -f ingest shape."""
    from parquet_to_sql_spark.operators.crawl import ingest_warc_shard_files
    from parquet_to_sql_spark.streaming.pipeline import crawl_files_stream

    shard_dir = str(tmp_path / "shards")
    os.makedirs(shard_dir)
    _write_crawl_shard(shard_dir, 0, [0, 5, 6, 9, 12])
    _write_crawl_shard(shard_dir, 1, [1, 2, 35, 48])

    batch_files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(shard_dir)
    )
    want = sorted(map(tuple, ingest_warc_shard_files(batch_files).collect()))
    assert any(r[8] for r in want) and any(not r[8] for r in want), (
        "fixture must produce both keep and drop verdicts"
    )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        q = (
            crawl_files_stream(spark, shard_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got1 == want
    # a new shard lands; the checkpoint must replay NOTHING
    _write_crawl_shard(shard_dir, 2, [7, 14, 21])
    run()
    got2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    new_rows = [t for t in got2 if t not in got1]
    assert sorted(t[0] for t in new_rows) == [7, 14, 21]
    assert len(got2) == len(got1) + 3  # no duplicates from shard 0/1

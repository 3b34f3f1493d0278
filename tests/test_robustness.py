"""Pipeline-robustness behaviors: incremental partition overwrite and
malformed-record handling — the failure modes a 100 TB ingest hits
daily (backfilling one day, a producer emitting broken JSON)."""

from __future__ import annotations

import pytest


def test_dynamic_partition_overwrite_backfills_one_partition(spark, tmp_path):
    """partitionOverwriteMode=dynamic replaces ONLY the partitions
    present in the incoming frame — the incremental-backfill story:
    rewriting day N does not touch days != N."""
    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, part string, v long",
    )
    base.write.partitionBy("part").parquet(path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix = spark.createDataFrame([(2, "a", 99)], "id long, part string, v long")
        fix.write.mode("overwrite").partitionBy("part").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    out = {(r.id, r.part, r.v) for r in spark.read.parquet(path).collect()}
    # partition a fully replaced by the backfill; b and c untouched
    assert out == {(2, "a", 99), (3, "b", 30), (4, "c", 40)}


@pytest.fixture()
def corrupt_jsonl(tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "{this is not json at all\n"
        '{"id": 3, "v": "fine"}\n'
    )
    return str(p)


def test_corrupt_json_permissive_captures_bad_rows(spark, corrupt_jsonl):
    df = spark.read.schema("id long, v string, _corrupt_record string").json(
        corrupt_jsonl
    )
    rows = df.collect()
    good = {(r.id, r.v) for r in rows if r._corrupt_record is None}
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == {(1, "ok"), (3, "fine")}
    assert len(bad) == 1 and bad[0].startswith("{this is not")


def test_corrupt_json_failfast_raises(spark, corrupt_jsonl):
    df = spark.read.option("mode", "FAILFAST").schema("id long, v string").json(
        corrupt_jsonl
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "MALFORMED" in str(ei.value)


def test_corrupt_json_dropmalformed_keeps_only_good(spark, corrupt_jsonl):
    df = spark.read.option("mode", "DROPMALFORMED").schema("id long, v string").json(
        corrupt_jsonl
    )
    assert {(r.id, r.v) for r in df.collect()} == {(1, "ok"), (3, "fine")}


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Lake schema evolution: files written before a column existed
    coexist with newer files; mergeSchema=true reads the union schema
    with nulls for the missing column (per-file footers differ — the
    default fast path would pick one footer and silently drop the new
    column for old files or fail)."""
    import pyspark.sql.functions as F

    old = spark.range(0, 5).select(F.col("id").alias("k"))
    new = spark.range(5, 8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("extra")
    )
    old.write.parquet(str(tmp_path / "t" / "batch=1"))
    new.write.parquet(str(tmp_path / "t" / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"k", "extra", "batch"}
    rows = {r.k: r.extra for r in merged.collect()}
    assert len(rows) == 8
    assert rows[0] is None and rows[7] == 70

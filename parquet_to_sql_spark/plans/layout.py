"""Data-layout operators: small-file compaction and range-clustered
(sorted) writes.

At 100 TB the two layout problems every long-lived lake hits:

  * SMALL FILES — streaming ingests and per-partition writers leave
    thousands of KB-scale parquet files; scan cost becomes task
    scheduling + footer reads instead of IO.  Fix: periodic compaction
    to ~target-sized files.
  * NO CLUSTERING — parquet row-group min/max statistics only prune
    when the data is clustered on the filter column.  Fix: a
    range-partitioned, sorted rewrite — each output file owns a
    disjoint key range, so a point/range predicate touches O(1) files
    instead of all of them.

Both are plain DataFrame writes — no custom committer — and both are
verified by reading the result back (file counts, per-file min/max
disjointness) in tests/test_layout.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def input_bytes(df: DataFrame) -> int:
    """Total bytes of the files backing a scan, via the Hadoop
    FileSystem API (works for any FS the cluster can reach — local,
    HDFS, object stores).  Metadata-only: O(#files) driver calls, the
    same cost the scan planner itself pays."""
    sc = df.sparkSession.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return total


def compaction_partitions(df: DataFrame, target_file_bytes: int) -> int:
    """Output file count for a compaction: measured input bytes over
    the target size (>= 1).  Parquet re-encodes with similar ratios,
    so input bytes are the right estimator.

    Non-file inputs (JDBC, createDataFrame, custom sources) report
    zero input bytes; funneling an unknown-sized dataset through ONE
    partition would be a silent straggler/OOM, so fall back to the
    dataset's current parallelism instead."""
    b = input_bytes(df)
    if b <= 0:
        return max(1, df.rdd.getNumPartitions())
    return max(1, math.ceil(b / target_file_bytes))


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    use_aqe_rebalance: bool = False,
) -> int:
    """Rewrite a (small-filed) dataset as ~target-sized files.

    Default path: measure the input, repartition round-robin to the
    computed file count, write.  Deterministic file count; one shuffle
    whose width IS the output layout.

    ``use_aqe_rebalance=True`` is the cluster-idiomatic variant: a
    REBALANCE hint lets AQE coalesce/split shuffle blocks to
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` at runtime —
    better when input stats are unavailable (a computed DataFrame
    rather than a scan) or skewed, at the cost of a runtime-decided
    file count.

    Returns the planned partition count (0 = decided by AQE).
    """
    if use_aqe_rebalance:
        df.hint("rebalance").write.mode("overwrite").parquet(path)
        return 0
    n = compaction_partitions(df, target_file_bytes)
    df.repartition(n).write.mode("overwrite").parquet(path)
    return n


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Clustered rewrite: range-partition on ``cluster_cols`` and sort
    within each partition, so every output file owns a disjoint key
    range and its row groups are internally ordered.

    This is what makes parquet min/max statistics actually prune:
    after this rewrite a selective filter on the cluster column skips
    whole files (and row groups within the touched file).  The same
    shape is the first dimension of a Z-order; for multi-column
    clustering the leading column gets file-level pruning and the
    rest get row-group-level ordering.

    ``repartitionByRange`` samples the data to pick balanced bounds —
    one extra pass, the price of balance.  Returns the file count.
    """
    if num_files is None:
        num_files = compaction_partitions(df, target_file_bytes)
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
    return num_files


def scale_to_bits(c, lo, hi, bits: int = 16):
    """Normalize an integer column from [lo, hi] onto [0, 2^bits):
    the required pre-step for Z-ordering, because interleaving RAW
    values lets the wider-ranged dimension own all the high bits and
    the key degenerates to single-column clustering.  lo/hi are
    Columns (broadcast a 1-row min/max aggregate alongside).

    Arithmetic is exact-in-double then floor (products stay far below
    2^53), so any engine reproduces it bit-identically."""
    import pyspark.sql.functions as F

    span = (hi - lo).cast("double")
    scaled = F.floor(
        (c - lo).cast("double") * F.lit(float((1 << bits) - 1)) / span
    ).cast("long")
    return F.when(span == 0.0, F.lit(0).cast("long")).otherwise(scaled)


def zorder_key(c1, c2, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of two
    non-negative integer columns — c1 in even positions, c2 in odd.

    Pure Column arithmetic (shifts + masks, whole-stage codegen), so
    it runs JVM-side at scan speed.  Sorting/range-partitioning on
    this key clusters BOTH dimensions at once: a rewrite via
    ``write_range_clustered(df, path, [zkey])`` gives min/max file
    pruning for predicates on either column, the standard multi-dim
    layout trick (public Delta/Iceberg OPTIMIZE ZORDER semantics).
    Inputs MUST be pre-normalized onto [0, 2^bits) with
    ``scale_to_bits`` — raw values with unequal ranges hand every
    high bit to the wider dimension and the key degenerates to a
    single-column sort.  Truncation to ``bits`` trades key width for
    codegen size; colliding keys only share a file, so correctness is
    unaffected."""
    import pyspark.sql.functions as F

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return out


def per_file_ranges(
    df_reader, path: str, col: str
) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``col`` per physical file of a parquet
    dataset — the readback check that clustering produced disjoint
    ranges.  Uses the ``_metadata.file_path`` hidden column: one
    distributed aggregate, no driver-side file loop."""
    import pyspark.sql.functions as F

    rows = (
        df_reader.parquet(path)
        .select(F.col("_metadata.file_path").alias("f"), F.col(col))
        .groupBy("f")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    return sorted((r.f, r.lo, r.hi) for r in rows)

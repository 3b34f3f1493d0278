"""SparkSession construction with scale-oriented defaults.

The reference wires its engine from config in
ParquetToSqlServiceProvider.php:10-32 (connection, batch_size,
copy_timeout); our equivalent of that DI layer is this builder plus
environment variables.

Defaults are chosen for the 100 TB posture:
  * AQE on (runtime coalescing, skew-join splitting, dynamic join
    selection) so plans re-optimize from real statistics.
  * shuffle partitions sized for the local harness via
    SPARK_GRAFT_CPUS; on a real cluster this is overridden (AQE
    coalescing makes a too-high initial value cheap).
  * nanosAsLong so Parquet TIMESTAMP(NANOS) columns (the `events`
    fixture) are readable; catalog.load_table converts to a proper
    timestamp column.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point applies, so the engine
# behaves identically under a session we build OR one handed to us
# (the driver's verify harness builds its own).
RUNTIME_CONFS: dict[str, str] = {
    # Parquet TIMESTAMP(NANOS) -> LongType instead of AnalysisException.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: coalesce post-shuffle partitions, split skewed
    # partitions, convert sort-merge join -> broadcast at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp rendering (reference formats 'Y-m-d
    # H:i:s.uP' in the value's own zone; ours is pinned to UTC).
    "spark.sql.session.timeZone": "UTC",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an externally-built session (best effort)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build — skip; builder path sets it.
            pass
    return spark


def get_spark(
    app_name: str = "parquet_to_sql_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to local[$SPARK_GRAFT_CPUS] (env, default 32).
    On a cluster deployment the caller passes master/None and submits
    via spark-submit; nothing here is local-mode-specific.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        from pyspark import SparkConf

        # respect a master supplied by spark-submit/--master: forcing
        # local[] here would silently run a "cluster" job single-node
        if not SparkConf().contains("spark.master"):
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Bound per-task input so huge files split into parallel scans.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Long-lived sessions running many queries accumulate shuffle
        # files and broadcasts until a driver GC lets the
        # ContextCleaner reap them; the default periodic GC (30 min)
        # outlives a whole bench run, so old state piles up and
        # inflates every later query (measured 1.5-3x on the heavy
        # ones).  30 s bounds the pile without measurable overhead.
        .config("spark.cleaner.periodicGC.interval", "30s")
        # The generated-class cache defaults to 100 entries; a session
        # running the full query surface (200+ plans, several codegen
        # stages each) thrashes it, paying janino recompilation on
        # every re-execution.  Sized to hold the whole workload.
        # (Read once at first codegen, so it must be set at build.)
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/parquet_to_sql_spark_warehouse"
            ),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)

"""Bucketed table layout — the shuffle-free join story, made checkable.

At 100 TB the dominant cost of a lineitem⋈orders-shaped join is
shuffling both sides on the join key. Bucketing both tables on that
key at WRITE time (same bucket count, sorted) moves the exchange from
query time to load time: every subsequent join/aggregate on the key
runs with ZERO Exchange operators — each task merge-joins its
co-located bucket pair.

The payoff is measured two ways:
  * bench.py runs `join_orderkey_shuffled` vs `join_orderkey_bucketed`
    (identical logical query, raw-parquet vs bucketed input);
  * tests/test_scale_features.py asserts the bucketed plan contains no
    shuffle Exchange at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BUCKET_TABLES = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = 16,
    prefix: str = "bkt",
) -> dict[str, str]:
    """Write orders/lineitem as managed tables bucketed+sorted on
    orderkey. Idempotent per (sf_dir, buckets): a marker property on
    the table skips the rewrite when the layout already matches.

    Returns {logical_name: table_name}.
    """
    from parquet_to_sql_spark.catalog import load_table

    out: dict[str, str] = {}
    marker = f"{sf_dir}|{buckets}"
    for logical, key in BUCKET_TABLES.items():
        table = f"{prefix}_{logical}"
        out[logical] = table
        if spark.catalog.tableExists(table):
            try:
                props = dict(
                    spark.sql(f"SHOW TBLPROPERTIES {table}")
                    .rdd.map(lambda r: (r[0], r[1]))
                    .collect()
                )
            except Exception:
                props = {}
            if props.get("spark_graft.bucket_marker") == marker:
                continue
            spark.sql(f"DROP TABLE {table}")
        else:
            # A fresh session's in-memory catalog forgets managed
            # tables but their warehouse locations persist on disk;
            # clear any leftover so saveAsTable doesn't collide.
            import shutil

            warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
            local = warehouse.removeprefix("file:")
            if local.startswith("/"):
                shutil.rmtree(f"{local}/{table}", ignore_errors=True)
        (
            load_table(spark, sf_dir, logical)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(table)
        )
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            "('spark_graft.bucket_marker' = '" + marker.replace("'", "''") + "')"
        )
    return out


def order_revenue_join(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The probe query both bench twins share: revenue per order via a
    sort-merge join on orderkey (hint('merge') pins the strategy so
    shuffled-vs-bucketed is an apples-to-apples layout comparison),
    then a groupBy on the SAME key — on bucketed input, join AND
    aggregate reuse the bucket partitioning, so the only exchange left
    is the single-row final rollup."""
    per_order = (
        lineitem.hint("merge")
        .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return per_order.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("revenue").cast("double").alias("total_revenue"),
        F.sum("n_items").alias("total_items"),
    )


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the static physical plan
    (broadcast exchanges excluded — those are the cheap kind).

    Formatted mode names every operator once in its detail section as
    '(n) Exchange' / '(n) BroadcastExchange', so counting those lines
    counts operators exactly once."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def persist_state_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 16,
    marker: str = "",
) -> DataFrame:
    """Persist an incremental-state relation (line ledger, MinHash
    band index, IVF quantizer/counts — VERDICT r09 #6) as a managed
    parquet table BUCKETED on ``keys`` and return the RELOADED
    DataFrame (``spark.table``), so probes read the stored layout,
    not the in-session lineage.

    Idempotent per ``marker`` (same table-property recipe as
    materialize_bucketed): a recurring pipeline calls this every run
    and only pays the write when the state generation changes.  Why
    bucketed: every probe of these relations is an equi-join on
    ``keys`` — with the stored side pre-partitioned, only the (much
    smaller) arriving slice shuffles, and the base corpus is never
    re-read or re-shuffled.  State ADVANCES by appending delta rows
    (``spark.table(t).unionByName(delta)`` re-persisted, or
    insertInto for true appends); the two-batch equivalence tests pin
    that appending equals a from-scratch rebuild."""
    if spark.catalog.tableExists(table):
        try:
            props = dict(
                spark.sql(f"SHOW TBLPROPERTIES {table}")
                .rdd.map(lambda r: (r[0], r[1]))
                .collect()
            )
        except Exception:
            props = {}
        if marker and props.get("spark_graft.state_marker") == marker:
            return spark.table(table)
        spark.sql(f"DROP TABLE {table}")
    else:
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        local = warehouse.removeprefix("file:")
        if local.startswith("/"):
            shutil.rmtree(f"{local}/{table}", ignore_errors=True)
    writer = df.write.bucketBy(buckets, keys[0], *keys[1:]).sortBy(
        keys[0], *keys[1:]
    )
    writer.saveAsTable(table)
    if marker:
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            "('spark_graft.state_marker' = '" + marker.replace("'", "''") + "')"
        )
    return spark.table(table)

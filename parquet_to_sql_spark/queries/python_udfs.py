"""Python UDF-family coverage: UDTF (table function) and Pandas
grouped-aggregate UDAF.

The engine's stance is JVM-expressions-first (every other query in
the registry avoids Python in the hot path); these two queries pin
the ESCAPE HATCHES — the supported way to run custom Python logic
when expressions genuinely can't express it:

  * Python UDTF (Spark 3.5+): one input row -> many output rows with
    schema, lateral-joined against the source.
  * Pandas grouped-agg UDAF: Arrow-batched per-group aggregation.

Both are written to be bit-deterministic (integer arithmetic inside
the Python side) so they still carry value-exact oracles.

(The udtf/pandas_udf decorators parse their schemas against an active
SparkSession, so they are applied lazily inside the build functions.)
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (type hints drive pandas_udf inference)
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.queries.registry import query


class ChunkDocument:
    """UDTF: split a document into fixed-size word chunks (the
    LLM-pipeline 'document chunking' primitive) — one input row
    expands to ceil(n_words/chunk) output rows."""

    def eval(self, text: str, chunk_size: int):
        # mirror the oracle's string_split_regex(trim(text), '\s+'):
        # NULL text yields no rows; empty/whitespace-only text yields
        # [''] (one empty token -> one chunk), unlike str.split()
        if text is None:
            return
        import re

        words = re.split(r"\s+", text.strip())
        for i in range(0, len(words), chunk_size):
            piece = words[i : i + chunk_size]
            yield i // chunk_size, " ".join(piece), len(piece)


def _weighted_price_cents_fn(price: "pd.Series", qty: "pd.Series") -> int:  # pragma: no cover
    # exact integer arithmetic: 2-decimal prices as cents x integer qty.
    # Series -> scalar type hints make pandas_udf infer GROUPED_AGG.
    cents = (price * 100).round().astype("int64")
    q = qty.round().astype("int64")
    return int((cents * q).sum())


def _total_qty_fn(qty: "pd.Series") -> int:  # pragma: no cover - executors
    return int(qty.round().astype("int64").sum())


@query(
    "udtf_chunk_documents",
    tags=("udtf", "python", "llm-pipeline"),
    oracle="""
    SELECT doc_id, u.chunk_index, u.chunk, u.n_words
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               range(1, CAST(ceil(len(w) / 20.0) AS BIGINT) + 1),
               i -> struct_pack(
                 chunk_index := CAST(i - 1 AS INT),
                 chunk := array_to_string(w[(i-1)*20 + 1 : i*20], ' '),
                 n_words := CAST(len(w[(i-1)*20 + 1 : i*20]) AS INT))))
               AS u
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents WHERE doc_id < 50) d
    ) t
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via a Python UDTF (20-word chunks), lateral-
    joined to keep doc_id. Deterministic pure-Python split, so the
    oracle reproduces it with list slicing."""
    from pyspark.sql.functions import udtf

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("_docs_to_chunk")
    spark.udtf.register(
        "chunk_document",
        udtf(ChunkDocument, returnType="chunk_index int, chunk string, n_words int"),
    )
    return spark.sql(
        """
        SELECT doc_id, c.chunk_index, c.chunk, c.n_words
        FROM _docs_to_chunk, LATERAL chunk_document(text, 20) AS c
        """
    )


@query(
    "udaf_pandas_weighted_avg",
    tags=("udaf", "pandas-udf", "python"),
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS weighted_cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(l_extendedprice * 100 AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag via a Pandas
    grouped-aggregate UDAF. Integer (cents x qty) arithmetic inside
    the UDF keeps partial sums exact, so the result is independent of
    row order and matches the pure-SQL oracle bit-for-bit."""
    from pyspark.sql.functions import pandas_udf

    weighted = pandas_udf(_weighted_price_cents_fn, "long")
    total_qty = pandas_udf(_total_qty_fn, "long")
    li = load_table(spark, sf_dir, "lineitem")
    # grouped-agg pandas UDFs cannot mix with built-in aggregates in
    # one agg(), so both aggregates are pandas UDAFs
    agg = li.groupBy("l_returnflag").agg(
        weighted(F.col("l_extendedprice"), F.col("l_quantity")).alias("weighted_cents"),
        total_qty(F.col("l_quantity")).alias("total_qty"),
    )
    return agg.select(
        "l_returnflag",
        "weighted_cents",
        "total_qty",
        (
            F.col("weighted_cents").cast("double")
            / F.col("total_qty").cast("double")
            / F.lit(100.0)
        ).alias("weighted_avg_price"),
    )


@query(
    "cogroup_customer_orders",
    tags=("python", "cogroup", "applyInPandas"),
    oracle="""
    SELECT c_custkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS total_cents,
           COALESCE(MAX(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS max_order_cents
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def cogroup_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (FlatMapCoGroupsInPandas): customer and
    orders groups arrive as two aligned pandas frames per custkey —
    the API for genuinely imperative two-sided per-key logic (sequence
    alignment, model scoring, reconciliation).  Money is handled as
    integer cents inside Python so the result is bit-exact against
    the SQL oracle: the Arrow cogroup path itself is what's under
    test, not float summation luck.

    Scale shape: both sides shuffle once on the key (same cost as a
    join) and stream through Arrow batches; anything SQL-expressible
    should stay a join — this exists to pin the escape hatch."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def reconcile(key, cust_pdf: pd.DataFrame, ord_pdf: pd.DataFrame) -> pd.DataFrame:
        if cust_pdf.empty:  # order for unknown customer: not in output
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "total_cents", "max_order_cents"]
            )
        cents = (ord_pdf["o_totalprice"] * 100).round().astype("int64")
        return pd.DataFrame(
            [
                {
                    "c_custkey": key[0],
                    "n_orders": len(ord_pdf),
                    "total_cents": int(cents.sum()) if len(cents) else 0,
                    "max_order_cents": int(cents.max()) if len(cents) else 0,
                }
            ]
        )

    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            reconcile,
            "c_custkey long, n_orders long, total_cents long, max_order_cents long",
        )
    )


@query(
    "groupedmap_spend_share",
    tags=("python", "grouped-map", "applyInPandas"),
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, event_id, cents,
             SUM(cents) OVER (PARTITION BY user_id) AS total_cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cents DESC, event_id) AS spend_rank
      FROM p
    )
    SELECT user_id, event_id, cents,
           CAST(CASE WHEN total_cents > 0
                     THEN (cents * 10000) // total_cents ELSE 0 END AS BIGINT)
             AS share_bp,
           CAST(spend_rank AS BIGINT) AS spend_rank
    FROM t
    """,
)
def groupedmap_spend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (FlatMapGroupsInPandas): each user's
    purchases arrive as one pandas frame; Python computes each
    purchase's share of the user's total in integer basis points and
    its spend rank — the single-sided escape hatch for imperative
    per-group logic (the two-sided variant is cogroup_customer_orders).
    Integer cents end-to-end, so the Arrow path is tested bit-exactly
    against a plain window-SQL oracle.

    Scale shape: one shuffle on user_id, groups stream through Arrow
    batches; a group must fit in one worker's memory — fine for
    per-user purchase lists, and exactly the constraint that makes
    window functions the better plan when the logic IS SQL-expressible
    (as here, deliberately, so it can be oracle-checked)."""
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    def shares(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["cents", "event_id"], ascending=[False, True]
        ).reset_index(drop=True)
        total = int(pdf["cents"].sum())
        if total > 0:
            num = pdf["cents"] * 10000
            q = num // total  # pandas floors...
            # ...but DuckDB // truncates toward zero: bump inexact
            # negative quotients up by one (refund-style rows)
            q = q + (((num % total) != 0) & (num < 0)).astype("int64")
            pdf["share_bp"] = q.astype("int64")
        else:
            pdf["share_bp"] = 0
        pdf["share_bp"] = pdf["share_bp"].astype("int64")
        pdf["spend_rank"] = (pdf.index + 1).astype("int64")
        return pdf

    return p.groupBy("user_id").applyInPandas(
        shares,
        "user_id long, event_id long, cents long, share_bp long, spend_rank long",
    )


_ITER_QUANT = 1 << 20


def _qnorm_batches(it):
    """Iterator-of-series body for the SCALAR_ITER pandas UDF below.

    The one-time setup (here: just the quantization constant; in a
    real inference pipeline: loading the model/tokenizer) runs ONCE
    per partition, then every Arrow batch streams through — the
    batching shape that makes per-partition model loading amortized
    instead of per-row.  Integer arithmetic (floor(x * 2^20) summed
    in int64) keeps the result bit-deterministic and oracle-exact.

    NULL and empty vectors yield NULL, matching DuckDB's NULL
    propagation (list_sum([]) and list_sum(NULL) are both NULL) —
    without the guard a NULL embedding would go through
    np.asarray(None) -> nan -> undefined int64.
    """
    import numpy as np

    quant = float(_ITER_QUANT)  # per-partition setup

    def qsum(v):
        if v is None or len(v) == 0:
            return None
        return int(
            np.floor(np.asarray(v, dtype=np.float64) * quant)
            .astype(np.int64).sum()
        )

    for series in it:
        # object dtype keeps Python ints exact and None as a true null;
        # Series.map would coerce a None-containing result to float64
        # (None -> NaN, and int64 sums past 2^53 would lose precision)
        yield pd.Series([qsum(v) for v in series], dtype="object")


@query(
    "udf_iter_quantized_norm",
    tags=("udf", "pandas-udf", "iterator", "python", "llm-pipeline"),
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1048576.0) AS BIGINT))) AS BIGINT) AS qsum
    FROM embeddings
    """,
)
def udf_iter_quantized_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form Pandas UDF (SCALAR_ITER) — the batch-inference
    escape hatch: per-partition setup runs once (where a real
    pipeline loads the embedding/scoring model), then Arrow batches
    stream through.  Computes a quantized element sum per embedding
    vector, bit-exact in both engines (floor(x*2^20) -> int64 sums),
    so even the Python path carries a value-exact oracle.  At scale
    this is the shape for GPU/model UDFs: no per-row Python overhead,
    no per-batch model reload, Arrow transfer both ways."""
    from typing import Iterator

    from pyspark.sql.functions import pandas_udf

    def body(it):
        yield from _qnorm_batches(it)

    # module uses postponed annotations (PEP 563), which leaves hints
    # as unresolvable strings for pandas_udf's eval-type inference —
    # attach real objects so it infers SQL_SCALAR_PANDAS_ITER_UDF
    body.__annotations__ = {
        "it": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    qsum = pandas_udf(body, "long")
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", qsum(F.col("embedding")).alias("qsum"))


@query(
    "udf_arrow_grouped_stats",
    tags=("python", "grouped-map", "applyInArrow", "spark4"),
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM customer GROUP BY c_mktsegment
    """,
)
def udf_arrow_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInArrow (Spark 4): each segment's rows arrive
    as a pyarrow.Table — no pandas materialization, so no
    object-dtype copies and no NaN coercion on the way in.  Money is
    cent-quantized with pyarrow compute kernels (integer arithmetic
    end to end), making the result bit-exact vs the SQL oracle.  Same
    scale shape as applyInPandas (one shuffle on the key, Arrow batch
    streaming); this pins the zero-copy variant of the escape hatch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cust = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")

    # NOTE: no inline type hints — under `from __future__ import
    # annotations` they become strings, which applyInArrow's eval-type
    # inference chokes on (UnboundLocalError in pyspark 4.1); real
    # annotation objects are attached below instead.
    def seg_stats(key, tbl):
        cents = pc.cast(pc.round(pc.multiply(tbl["c_acctbal"], 100.0)), pa.int64())
        return pa.table(
            {
                "c_mktsegment": pa.array([key[0].as_py()], pa.string()),
                "n_customers": pa.array([tbl.num_rows], pa.int64()),
                "total_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "max_cents": pa.array([pc.max(cents).as_py()], pa.int64()),
            }
        )

    seg_stats.__annotations__ = {"key": tuple, "tbl": pa.Table, "return": pa.Table}

    return (
        cust.groupBy("c_mktsegment")
        .applyInArrow(
            seg_stats,
            "c_mktsegment string, n_customers long, total_cents long, max_cents long",
        )
    )

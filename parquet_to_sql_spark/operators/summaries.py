"""Bounded-memory mergeable summaries (Misra–Gries heavy hitters).

The production problem: find all keys whose frequency exceeds n/k in a
stream/corpus whose DISTINCT-key cardinality exceeds executor memory.
A plain ``groupBy(key).count()`` is exact and (with map-side partial
aggregation) the right Spark answer while the per-partition hash map
fits; when it doesn't, partial aggregation degrades to spilling and
re-shuffling the full key universe.  The Misra–Gries summary
(Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
Summaries", PODS 2012 — both public) bounds per-partition state to a
FIXED ``capacity`` counters regardless of cardinality, at the price of
returning a candidate SUPERSET — which one cheap semi-join recount
pass then makes exact.

Guarantee used here: after merging per-batch counts and decrementing
by the (capacity+1)-th largest counter, every key with true partition
count > n_p/(capacity+1) survives the partition summary; by pigeonhole
any key with GLOBAL count > n/(capacity+1) exceeds that bound in at
least one partition, so the union of partition summaries contains
every global heavy hitter.  The final output — exact recount filtered
by ``cnt * (capacity+1) > n`` — is therefore EXACTLY the true heavy-
hitter set, independent of partitioning; that determinism is what
makes the operator oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries summaries over a string key column.

    mapInPandas (Arrow-batched) is the honest tool here: the summary is
    inherently sequential per-partition state, inexpressible as an
    algebraic Spark aggregate without materializing the full key
    universe — exactly what the operator exists to avoid.  Work per
    batch is one vectorized ``value_counts`` plus dict merges over at
    most ``capacity + #batch-distinct`` entries.  Emits candidate keys
    only (<= capacity rows per partition).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for k, c in pdf[key_col].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > capacity:
                # mergeable-summaries decrement: subtract the
                # (capacity+1)-th largest count, evict the non-positive
                vals = sorted(counters.values(), reverse=True)
                d = vals[capacity]
                counters = {k: v - d for k, v in counters.items() if v > d}
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.mapInPandas(summarize, f"{key_col} string")


def heavy_hitters_exact(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Exact heavy hitters (count * (capacity+1) > n) via Misra–Gries
    candidate pruning + one broadcast semi-join recount.

    Scale shape — exactly TWO corpus scans: pass 1 reduces each
    partition to <= capacity candidate rows (bounded memory by
    construction); the distinct candidate relation is tiny
    (<= capacity * #partitions) and broadcasts; pass 2 recounts with
    the key MASKED to null for non-candidates, so one aggregate yields
    both the per-candidate counts and (as the null bucket + their sum)
    the total row count — no third scan just for n_total.  The
    aggregate's key universe is the candidate set + 1, so the shuffle
    is bounded; the unpartitioned window that attaches n_total runs
    over that same bounded post-aggregate relation (<= capacity *
    #partitions + 1 rows), never the corpus.  Returns (key, cnt,
    n_total), exactly the true heavy-hitter set regardless of
    partitioning.
    """
    from pyspark.sql import Window

    # null keys are EXCLUDED from the analysis — consistently: pandas
    # value_counts drops them from candidates and an equi-join recount
    # would too, so n_total must not count them either (it previously
    # did, silently deflating every key's threshold share)
    df = df.filter(F.col(key_col).isNotNull())
    cands = misra_gries_candidates(df, key_col, capacity).distinct()
    masked = df.join(
        F.broadcast(cands.withColumn("_is_cand", F.lit(True))), key_col, "left"
    ).select(F.when(F.col("_is_cand"), F.col(key_col)).alias("_k"))
    counts = masked.groupBy("_k").agg(F.count(F.lit(1)).alias("cnt"))
    enriched = counts.withColumn(
        "n_total", F.sum("cnt").over(Window.partitionBy())
    )
    return (
        enriched.filter(
            F.col("_k").isNotNull()
            & (F.col("cnt") * F.lit(capacity + 1) > F.col("n_total"))
        )
        .select(F.col("_k").alias(key_col), "cnt", "n_total")
    )

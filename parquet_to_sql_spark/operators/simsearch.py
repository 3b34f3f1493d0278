"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring how ANN is actually deployed:
  * brute-force cosine top-k — the exactness baseline. Query set is
    broadcast; every (query, candidate) score is one JVM-side
    fold (zip_with + aggregate in double precision, no UDF); top-k via
    ROW_NUMBER per query. Cost O(nq * n) — right when nq is small.
  * IVF (inverted-file) — the scale path: pick deterministic
    centroids, assign every vector to its nearest centroid (one
    broadcast join against <=K centroids), then probe only the
    `nprobe` centroids nearest the query. Search cost drops by
    ~K/nprobe; the coarse quantizer is a tiny broadcast table at any
    data size.

All arithmetic is float->double then IEEE-deterministic, so results
hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product in double (deterministic)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(
    df: DataFrame, id_col: str, vec_col: str, prefix: str, rebalance: bool = False
) -> DataFrame:
    if rebalance:
        from parquet_to_sql_spark.operators.text import rebalance_for_compute

        df = rebalance_for_compute(df.select(id_col, vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_{id_col}"),
        F.col(vec_col).alias(f"{prefix}_vec"),
        norm_expr(vec_col).alias(f"{prefix}_norm"),
    )


def cosine_expr(a_vec: str, b_vec: str, a_norm: str, b_norm: str) -> Column:
    return dot_expr(a_vec, b_vec) / (F.col(a_norm) * F.col(b_norm))


def l2sq_expr(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance as a sequential left-fold in double
    (monotone in the true distance, so rankings need no sqrt)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    d = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def rrf_fuse_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank-fusion top-k (Cormack, Clarke, Büttcher, SIGIR
    2009, public): fuse a cosine-similarity ranking and a Euclidean-
    distance ranking of the same candidate set, score each candidate
    ``sum over rankings of floor(1e6 / (rrf_k + rank))`` counting only
    top-``pool`` appearances, and return the ``k`` best fused.

    The production retrieval pattern: ensembling rankers needs only
    RANKS, never score calibration — so the fused score here is pure
    integer arithmetic (floor of one IEEE division), value-exact
    across engines with zero float discipline.

    Plan shape: ONE broadcast-queries × corpus scored relation feeds
    both rankings (two window functions over the same qid
    partitioning — one exchange, two sorts), so fusion costs no
    second scan and no outer join.  Returns (query_id, neighbor_id,
    rrf_score, fused_rank)."""
    qid, cid = f"q_{id_col}", f"c_{id_col}"
    q = with_norm(queries, id_col, vec_col, prefix="q")
    c = with_norm(df, id_col, vec_col, prefix="c", rebalance=True)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(qid) != F.col(cid))
        .withColumn("cosine", cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
        .withColumn("l2sq", l2sq_expr("q_vec", "c_vec"))
    )
    w_cos = Window.partitionBy(qid).orderBy(F.desc("cosine"), F.col(cid))
    w_l2 = Window.partitionBy(qid).orderBy(F.asc("l2sq"), F.col(cid))
    ranked = scored.select(
        F.col(qid),
        F.col(cid),
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_l2).alias("r_l2"),
    )

    def _contrib(rank: Column) -> Column:
        return F.when(
            rank <= pool,
            F.floor(F.lit(1_000_000.0) / (F.lit(rrf_k) + rank)),
        ).otherwise(F.lit(0).cast("long"))

    fused = ranked.select(
        F.col(qid),
        F.col(cid),
        (_contrib(F.col("r_cos")) + _contrib(F.col("r_l2")))
        .cast("long")
        .alias("rrf_score"),
    ).filter(F.col("rrf_score") > 0)
    w_f = Window.partitionBy(qid).orderBy(F.desc("rrf_score"), F.col(cid))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= k)
        .select(
            F.col(qid).alias("query_id"),
            F.col(cid).alias("neighbor_id"),
            "rrf_score",
            F.col("fused_rank").cast("int").alias("fused_rank"),
        )
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: for each query row (same schema),
    the k nearest non-identical vectors. Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = with_norm(queries, id_col, vec_col, prefix="q")
    # corpus side: the per-row dot-product folds dominate, spread them
    c = with_norm(df, id_col, vec_col, prefix="c", rebalance=True)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(f"q_{id_col}") != F.col(f"c_{id_col}"))
        .withColumn("cosine", cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
    )
    w = Window.partitionBy(f"q_{id_col}").orderBy(
        F.desc("cosine"), F.col(f"c_{id_col}")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(f"q_{id_col}").alias("query_id"),
            F.col(f"c_{id_col}").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties ->
    smallest centroid id). One broadcast join; adds `centroid_id`."""
    c = with_norm(centroids, id_col, vec_col, prefix="cent")
    v = with_norm(df, id_col, vec_col, prefix="v")
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "sim", cosine_expr("v_vec", "cent_vec", "v_norm", "cent_norm")
    )
    w = Window.partitionBy(f"v_{id_col}").orderBy(F.desc("sim"), F.col(f"cent_{id_col}"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(f"v_{id_col}").alias(id_col),
            F.col("v_vec").alias(vec_col),
            F.col(f"cent_{id_col}").alias("centroid_id"),
        )
    )


KMEANS_QUANT = 1 << 30  # power of two: x * 2^30 is EXACT for float32 inputs


def kmeans_refine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    iterations: int = 2,
) -> DataFrame:
    """Seeded Lloyd refinement of IVF centroids, cross-engine exact.

    Each iteration: assign every vector to its nearest centroid by
    cosine (broadcast join against <=K centroids), then recompute each
    centroid as the element-wise mean of its cluster. Distributed
    shape: posexplode to (centroid, dim, value) and ONE groupBy — never
    a per-cluster collect.

    Determinism (the oracle re-runs this in SQL and must hash-match):
    float means are order-sensitive, and decimal casts of long-tail
    doubles round differently across engines — so values are quantized
    to integers first: q = floor(x * 2^30). The multiply is exact
    (power of two, float32 mantissa), floor is exact, integer SUM is
    exact (decimal accumulator, overflow-proof at any cluster size),
    and the final CAST(sum)/(count * 2^30) is one IEEE double division
    — bit-identical everywhere. Quantization error (2^-30 per value)
    is far below any clustering signal.

    Empty clusters drop out (both engines' GROUP BY agree). Returns
    (id_col, vec_col) like the input centroid frame.
    """
    cent = centroids
    for _ in range(iterations):
        assigned = ivf_assign(df, id_col, vec_col, cent)
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .select(
                "centroid_id",
                "dim",
                F.floor(F.col("val").cast("double") * F.lit(float(KMEANS_QUANT)))
                .cast("decimal(28,0)")
                .alias("q"),
            )
            .groupBy("centroid_id", "dim")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.count(F.lit(1)).cast("double") * F.lit(float(KMEANS_QUANT)))
                ).alias("m")
            )
        )
        cent = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                F.col("centroid_id").alias(id_col),
                F.transform("dm", lambda s: s["m"]).alias(vec_col),
            )
        )
    return cent


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF search: probe the nprobe nearest centroids per query, then
    brute-force only inside those buckets. Returns
    (query_id, neighbor_id, cosine, rank). Approximate: recall < 1
    when a true neighbor lives in an unprobed bucket."""
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    # which buckets each query probes
    q_probe = (
        ivf_topk_probes(queries, id_col, vec_col, centroids, nprobe)
    )
    q = with_norm(queries, id_col, vec_col, prefix="q").join(
        q_probe, F.col(f"q_{id_col}") == F.col("query_id")
    )
    c = assigned.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        "centroid_id",
    ).withColumn("c_norm", norm_expr("c_vec"))
    scored = (
        q.join(c, "centroid_id")
        .filter(F.col(f"q_{id_col}") != F.col("c_id"))
        .withColumn("cosine", cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
    )
    w = Window.partitionBy(f"q_{id_col}").orderBy(F.desc("cosine"), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(f"q_{id_col}").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def ivf_topk_probes(
    queries: DataFrame, id_col: str, vec_col: str, centroids: DataFrame, nprobe: int
) -> DataFrame:
    """(query_id, centroid_id) rows for the nprobe nearest centroids."""
    c = with_norm(centroids, id_col, vec_col, prefix="cent")
    q = with_norm(queries, id_col, vec_col, prefix="qq")
    scored = q.crossJoin(F.broadcast(c)).withColumn(
        "sim", cosine_expr("qq_vec", "cent_vec", "qq_norm", "cent_norm")
    )
    w = Window.partitionBy(f"qq_{id_col}").orderBy(F.desc("sim"), F.col(f"cent_{id_col}"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col(f"qq_{id_col}").alias("query_id"),
            F.col(f"cent_{id_col}").alias("centroid_id"),
        )
    )


def hyperplane_weight(p: int, d, dims: int = 64) -> Column:
    """Deterministic pseudo-random plane weight for (plane p, dim d):
    centered 31-bit LCG value, identical formula in the SQL oracle.
    The stride must be the caller's `dims` — a fixed stride would make
    plane p's weights for dims beyond it identical to plane p+1's
    leading weights (correlated planes, degraded LSH independence)."""
    # long arithmetic: 1103515245 * idx overflows 32-bit int silently
    idx = (F.lit(p * dims).cast("long") + d.cast("long"))
    return (
        (F.lit(1103515245).cast("long") * idx + F.lit(12345)) % F.lit(2147483648)
        - F.lit(1073741824)
    ).cast("double")


def hyperplane_bucket(vec: Column | str, planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket (cosine-space SimHash): bit p is
    the sign of <vec, plane_p>; vectors with small angles collide.

    The planes are derived from an integer LCG, so bucket assignment
    is reproducible anywhere — including the DuckDB oracle — with no
    shipped side data. All JVM expressions; no UDF."""
    vec = F.col(vec) if isinstance(vec, str) else vec

    # NOTE: a two-parameter lambda would be treated by PySpark as the
    # (element, index) transform variant — bind the plane index via a
    # closure factory, never a default argument.
    def term(p: int):
        return lambda d: (
            F.element_at(vec, d.cast("int")).cast("double")
            * hyperplane_weight(p, d, dims)
        )

    bucket = F.lit(0)
    for p in range(planes):
        dot = F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(dims)), term(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("long")


# --- Product quantization (Jégou, Douze, Schmid, TPAMI 2011, public) --

PQ_SUBS = 8      # subspaces
PQ_SUBDIM = 8    # dims per subspace (8*8 = the fixture's 64 dims)


def l2sq_sub_expr(a: Column | str, b: Column | str, s: int) -> Column:
    """Squared L2 distance restricted to subspace ``s`` (dims
    s*PQ_SUBDIM+1 .. (s+1)*PQ_SUBDIM), as the usual deterministic
    left fold."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    asub = F.slice(a, s * PQ_SUBDIM + 1, PQ_SUBDIM)
    bsub = F.slice(b, s * PQ_SUBDIM + 1, PQ_SUBDIM)
    d = F.zip_with(
        asub,
        bsub,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def l2sq_sub_sql(a: str, b: str, s: int) -> str:
    """l2sq_sub_expr as ONE SQL fragment (optimization r14): the
    Column formulation costs ~30 py4j round trips per subspace (two
    slices + two HOF lambdas), ~250 per 8-subspace distance table —
    measured as the dominant share of pq_adc_topk's per-rep
    construction time.  Semantically identical expression (0.0D seed
    keeps the fold in DOUBLE exactly like F.lit(0.0); same left fold,
    same cast order), one py4j call for the whole array when the
    caller joins the fragments."""
    lo = s * PQ_SUBDIM + 1
    return (
        f"aggregate(zip_with(slice({a}, {lo}, {PQ_SUBDIM}), "
        f"slice({b}, {lo}, {PQ_SUBDIM}), "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, x) -> acc + x)"
    )


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codes: DataFrame
) -> DataFrame:
    """Product-quantization encoding: per subspace, replace each
    vector's subvector with the id of its nearest codebook entry
    (L2, ties to the lower code id) — compressing each vector to
    PQ_SUBS small ints (8 bytes here vs 256 float bytes, the memory
    bound that makes billion-vector ANN serviceable).

    ``codes`` is a (code_id, vector) relation; it is TINY by
    construction.  Returns (id, c0..c{PQ_SUBS-1}).

    Optimization r13: the arg-min runs as a vectorized Arrow kernel
    — the former broadcast-cross-join + PQ_SUBS min(struct) groupBy
    evaluated the interpreted l2sq fold |codes| x PQ_SUBS times per
    vector (~7 s of executor CPU at sf0.1).  The kernel accumulates
    the squared-difference fold SEQUENTIALLY over dims in double
    (identical operation order and rounding to the JVM left fold,
    so distances — and therefore arg-mins with the same
    lower-code-id tie-break — are bit-exact; pinned against the
    retained JVM formulation, pq_encode_jvm, by
    tests/test_hashkernel.py).  The codebook is collected to the
    driver (bounded by construction: a codebook is a few KB) and
    shipped inside the closure."""
    import numpy as np

    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    rows = sorted(
        codes.select(
            F.col(codes.columns[0]).alias("_code_id"),
            F.col(codes.columns[1]).alias("_cv"),
        ).collect(),
        key=lambda r: r["_code_id"],
    )
    code_ids = [int(r["_code_id"]) for r in rows]
    cv = np.array([list(r["_cv"]) for r in rows], dtype=np.float64)

    v = rebalance_for_compute(df.select(id_col, vec_col))
    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0)
            vecs = np.array(rb.column(1).to_pylist(), dtype=np.float64)
            n = len(vecs)
            out_codes = []
            for s in range(PQ_SUBS):
                lo = s * PQ_SUBDIM
                best_d = None
                best_c = None
                # ascending code id + strict < == min(struct(d, c))
                for ci, code_id in enumerate(code_ids):
                    acc = np.zeros(n, np.float64)
                    for j in range(PQ_SUBDIM):
                        diff = vecs[:, lo + j] - cv[ci, lo + j]
                        acc = acc + diff * diff
                    if best_d is None:
                        best_d = acc
                        best_c = np.full(n, code_id, np.int64)
                    else:
                        better = acc < best_d
                        best_d = np.where(better, acc, best_d)
                        best_c = np.where(better, code_id, best_c)
                out_codes.append(pa.array(best_c, pa.int64()))
            yield pa.record_batch([ids, *out_codes],
                                  names=[id_col, *[f"c{s}" for s in range(PQ_SUBS)]])

    schema = f"{id_col} {id_type}, " + ", ".join(
        f"c{s} bigint" for s in range(PQ_SUBS)
    )
    return v.mapInArrow(run, schema)


def pq_encode_jvm(
    df: DataFrame, id_col: str, vec_col: str, codes: DataFrame
) -> DataFrame:
    """The pre-r13 JVM formulation of pq_encode (broadcast cross join
    + min(struct) aggregates): the reference the Arrow kernel is
    equivalence-tested against."""
    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    v = rebalance_for_compute(df.select(id_col, vec_col))
    pairs = v.crossJoin(
        F.broadcast(
            codes.select(
                F.col(codes.columns[0]).alias("_code_id"),
                F.col(codes.columns[1]).alias("_cv"),
            )
        )
    )
    aggs = [
        F.min(
            F.struct(
                l2sq_sub_expr(vec_col, "_cv", s).alias("d"),
                F.col("_code_id").alias("c"),
            )
        ).alias(f"_k{s}")
        for s in range(PQ_SUBS)
    ]
    enc = pairs.groupBy(id_col).agg(*aggs)
    return enc.select(
        F.col(id_col), *[F.col(f"_k{s}.c").alias(f"c{s}") for s in range(PQ_SUBS)]
    )


def residual_expr(vec: Column | str, cent_vec: Column | str) -> Column:
    """Element-wise residual (vec - centroid) in double.  Exact:
    float32 inputs cast to double exactly, and a single subtraction is
    IEEE-deterministic — so residuals are bit-identical cross-engine."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    cent_vec = F.col(cent_vec) if isinstance(cent_vec, str) else cent_vec
    return F.zip_with(
        vec, cent_vec, lambda x, y: x.cast("double") - y.cast("double")
    )


def ivfpq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    centroids: DataFrame,
    codes_filter: Column,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-PQ with asymmetric-distance scoring — the production ANN
    index shape (Jégou et al., TPAMI 2011; the FAISS ``IVFPQ`` index,
    public): a coarse quantizer routes each vector to an inverted
    list, product quantization compresses the RESIDUAL
    (vector - centroid) to PQ_SUBS one-byte codes, and queries score
    candidates by summing entries of a per-(query, probed-centroid)
    distance table — touching no full-precision corpus vector.

    Quantizing residuals instead of raw vectors is what makes the
    combination work: residual magnitudes are much smaller than vector
    magnitudes, so the same codebook budget yields far less
    quantization error.  The codebook here is the deterministic seed
    slice selected by ``codes_filter`` (a predicate over the id
    column) taken AFTER residualization, shared across cells (the
    single-shared-codebook variant FAISS defaults to).

    Plan shape (corpus is never shuffled):
      1. coarse assign — one broadcast join against <=K centroids;
      2. residuals — a narrow map (zip_with) over the scan;
      3. encode — one broadcast cross join against the tiny codebook
         + one groupBy with PQ_SUBS min(struct) arg-mins (map-side);
      4. probes + distance table — queries x nprobe x |codes| rows,
         tiny, rolled up to one (centroid, code) -> distances map per
         query and broadcast;
      5. score — ONE broadcast join + PQ_SUBS row-local map lookups;
         candidates in unprobed cells look up NULL and are dropped
         (the map only contains probed cells).

    Determinism: residual subtraction is exact, subspace L2 folds are
    sequential left-folds, the ADC sum is one fixed-order expression,
    and arg-min ties break to the lower code id via min(struct) — so
    the result hash-matches the SQL oracle exactly.  Returns
    (query_id, neighbor_id, approx_l2sq, rank).
    """
    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    # 1. coarse assignment, then residuals against the assigned centroid
    cent_b = F.broadcast(
        centroids.select(
            F.col(id_col).alias("_cent_id"), F.col(vec_col).alias("_cent_vec")
        )
    )
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    # materialized once: both the codebook filter and the encode cross
    # join reference `res`, and its lineage (IVF assign window + the
    # residual join) is the expensive stage — without the checkpoint
    # it replays per reference
    res = (
        rebalance_for_compute(assigned)
        .join(cent_b, F.col("centroid_id") == F.col("_cent_id"))
        .select(
            id_col,
            "centroid_id",
            residual_expr(vec_col, "_cent_vec").alias("_rvec"),
        )
        .localCheckpoint()
    )
    # 2. shared residual codebook from the deterministic seed slice
    codes = F.broadcast(
        res.filter(codes_filter).select(
            F.col(id_col).alias("_code_id"), F.col("_rvec").alias("_cv")
        )
    )
    # 3. encode: arg-min code per subspace, centroid carried through
    # arg-min aggregates as expr strings (r14, same construction-cost
    # fix as pq_adc_topk — identical min(struct) expressions)
    enc = (
        res.crossJoin(codes)
        .groupBy(id_col, "centroid_id")
        .agg(
            *[
                F.expr(
                    f"min(struct({l2sq_sub_sql('_rvec', '_cv', s)} AS d, "
                    "_code_id AS c))"
                ).alias(f"_k{s}")
                for s in range(PQ_SUBS)
            ]
        )
        .select(
            F.col(id_col),
            "centroid_id",
            *[F.col(f"_k{s}.c").alias(f"c{s}") for s in range(PQ_SUBS)],
        )
    )
    # 4. probes + per-(query, centroid) residual distance table
    probes = ivf_topk_probes(queries, id_col, vec_col, centroids, nprobe)
    qres = (
        probes.join(
            queries.select(
                F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv")
            ),
            F.col("query_id") == F.col("_qid"),
        )
        .join(cent_b, F.col("centroid_id") == F.col("_cent_id"))
        .select(
            "query_id",
            "centroid_id",
            residual_expr("_qv", "_cent_vec").alias("_rq"),
        )
    )
    dt = qres.crossJoin(codes).select(
        "query_id",
        F.col("centroid_id").alias("_dt_cent"),
        "_code_id",
        F.expr(
            "array({})".format(
                ", ".join(l2sq_sub_sql("_rq", "_cv", s) for s in range(PQ_SUBS))
            )
        ).alias("_ds"),
    )
    # 5. ADC scoring as ONE broadcast join + row-local map lookups:
    # per query, a map (centroid, code) -> [d0..d{S-1}] containing
    # only PROBED cells; a candidate in an unprobed cell looks up
    # NULL and is dropped — same pruning the r5 shape got from its
    # first join, without chaining PQ_SUBS broadcast joins (the same
    # rewrite as pq_adc_topk; distinct keys make collect_list order
    # irrelevant)
    dmap = dt.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.struct(
                        F.col("_dt_cent").alias("ct"),
                        F.col("_code_id").alias("cd"),
                    ).alias("key"),
                    F.col("_ds").alias("value"),
                )
            )
        ).alias("_dmap")
    )
    cur = enc.crossJoin(F.broadcast(dmap))
    # same left-associative fixed-order sum as the former Column chain
    approx = F.expr(
        " + ".join(
            "element_at(element_at(_dmap, "
            f"struct(centroid_id AS ct, c{s} AS cd)), {s + 1})"
            for s in range(PQ_SUBS)
        )
    )
    scored = (
        cur.select(
            F.col("query_id"),
            F.col(id_col).alias("neighbor_id"),
            approx.alias("approx_l2sq"),
        )
        .filter(F.col("approx_l2sq").isNotNull())
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2sq"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "approx_l2sq",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    codes: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    full-precision, each candidate is its PQ code, and the approximate
    distance is the sum over subspaces of a PRECOMPUTED
    (query, code) distance table — so scoring a candidate reads
    PQ_SUBS table entries instead of touching any float vector.

    Plan shape: the distance table is queries x codebook
    (tiny: nq * |codes| rows), rolled up to ONE map column per query
    (code_id -> the PQ_SUBS per-subspace distances) and broadcast;
    each corpus row scores with PQ_SUBS row-local map lookups —
    a single broadcast join, zero corpus shuffles (the r5 shape
    chained PQ_SUBS separate broadcast hash joins, each rebuilding
    the corpus x queries intermediate — one join + element_at
    lookups measured materially faster and is the textbook ADC
    table-lookup shape).  The final sum is one fixed-order
    expression (d0 + d1 + ...), keeping the float result
    deterministic and cross-engine exact.  Top-k per query by
    (approx_l2sq ASC, candidate id).  Returns
    (query_id, neighbor_id, approx_l2sq, rank)."""
    qid_c, cid_c = f"q_{id_col}", id_col
    enc = pq_encode(df, id_col, vec_col, codes)
    q = queries.select(F.col(id_col).alias(qid_c), F.col(vec_col).alias("_qv"))
    # distance-table array and ADC sum built as SINGLE expr strings
    # (optimization r14): the Column-by-Column construction (8
    # slice/zip_with/aggregate trees + 16 nested element_ats) was
    # ~60-70% of this query's per-rep driver construction time —
    # identical expressions, two py4j calls instead of ~300.
    ds_sql = "array({})".format(
        ", ".join(l2sq_sub_sql("_qv", "_cv", s) for s in range(PQ_SUBS))
    )
    dt = q.crossJoin(
        F.broadcast(
            codes.select(
                F.col(codes.columns[0]).alias("_code_id"),
                F.col(codes.columns[1]).alias("_cv"),
            )
        )
    ).select(F.col(qid_c), F.col("_code_id"), F.expr(ds_sql).alias("_ds"))
    # one map per query: code_id -> [d0..d{S-1}] (distinct keys, so
    # collect_list order is irrelevant to the map's content)
    dmap = dt.groupBy(qid_c).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_code_id"), F.col("_ds")))
        ).alias("_dmap")
    )
    cur = enc.crossJoin(F.broadcast(dmap))
    # same left-associative fixed-order sum as the former Column chain
    approx = F.expr(
        " + ".join(
            f"element_at(element_at(_dmap, c{s}), {s + 1})"
            for s in range(PQ_SUBS)
        )
    )
    scored = cur.select(
        F.col(qid_c).alias("query_id"),
        F.col(cid_c).alias("neighbor_id"),
        approx.alias("approx_l2sq"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2sq"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "approx_l2sq",
            F.col("rank").cast("int").alias("rank"),
        )
    )


GRAM_SCALE = 1 << 20  # floor(x * 2^20): exact power-of-two scaling


def gram_quantized_upper(
    df: DataFrame, vec_col: str, scale: int = GRAM_SCALE
) -> DataFrame:
    """Upper triangle of the corpus gram matrix sum(q qT) over
    quantized vectors q = floor(x * scale) — the one-pass sufficient
    statistic behind PCA / covariance / whitening, made cross-engine
    EXACT by integer arithmetic (floor of a power-of-two scaling is
    IEEE-identical everywhere; products and sums are int64).

    Scale shape: the d(d+1)/2 pair expansion happens MAP-SIDE inside
    one select (posexplode of the row's own array twice — no join, no
    per-row shuffle), and the single shuffle carries at most
    d(d+1)/2 * n_partitions combiner rows after partial aggregation:
    output size is O(d^2), INDEPENDENT of corpus row count.  This is
    the canonical "big n, small d" reduction — the same shape works
    for X^T X regression normal equations.

    int64 headroom: |q| <= ~|x|*scale; with unit-ish embeddings and
    the default scale, per-row products are < 2^46, so ~2^17 billion
    rows fit before the sum approaches 2^63.  For larger corpora,
    lower `scale` or re-aggregate per-shard partials in DECIMAL.
    """
    qs = df.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "long"
            ),
        ).alias("qs")
    )
    e1 = qs.select(F.posexplode("qs").alias("i", "qi"), F.col("qs"))
    e2 = e1.select(
        "i", "qi", F.posexplode("qs").alias("j", "qj")
    ).filter(F.col("j") >= F.col("i"))
    return e2.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).alias("q_sum")
    )


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, k: int = 2
) -> DataFrame:
    """Distributed PCA by sufficient statistics: ONE aggregation pass
    computes n, per-dimension sums, and the d x d gram matrix (all
    JVM-side fold arithmetic); the d x d covariance eigensolve runs on
    the DRIVER (trivial for embedding-sized d); the top-k principal
    directions are broadcast back as literal arrays and every vector
    is projected with a zip_with fold — no Python UDF anywhere, no
    iteration over the data.

    This is the standard big-n-small-d PCA decomposition: data passes
    are O(n d^2 / cores) map-side work + one O(d^2)-row shuffle;
    driver work is O(d^3) regardless of corpus size.  (For d in the
    thousands, swap the driver eigensolve for distributed power
    iteration — out of scope here.)

    Sign convention: each component is flipped so its
    largest-magnitude coordinate is positive (eigenvector sign is
    otherwise arbitrary).  Returns (id_col, pc0..pc{k-1}).
    """
    import numpy as np

    first = df.select(vec_col).first()
    if first is None or first[0] is None:
        raise ValueError("pca_project: empty input (no vectors to fit)")
    d = len(first[0])
    ex = df.select(F.posexplode(vec_col).alias("i", "x")).select(
        "i", F.col("x").cast("double").alias("x")
    )
    sums = {r["i"]: r["s"] for r in ex.groupBy("i").agg(F.sum("x").alias("s")).collect()}
    n = df.count()
    g = gram_quantized_upper(df, vec_col)
    G = np.zeros((d, d))
    scale2 = float(GRAM_SCALE) ** 2
    for r in g.collect():
        # dequantize: q_sum/scale^2 ~= sum(x_i x_j) (quantization error
        # O(1/scale) per element — negligible against unit-scale data)
        G[r["i"], r["j"]] = G[r["j"], r["i"]] = r["q_sum"] / scale2
    mu = np.array([sums.get(i, 0.0) for i in range(d)]) / n
    C = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(C)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # top-k rows
    comps = comps * np.where(
        comps[np.arange(k), np.abs(comps).argmax(axis=1)] < 0, -1.0, 1.0
    ).reshape(-1, 1)
    centered = F.transform(
        F.col(vec_col), lambda x: x.cast("double")
    )
    out_cols = []
    for c in range(k):
        w = F.array(*[F.lit(float(v)) for v in comps[c]])
        mdot = float(mu @ comps[c])
        proj = (
            F.aggregate(
                F.zip_with(centered, w, lambda x, wv: x * wv),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            - F.lit(mdot)
        )
        out_cols.append(proj.alias(f"pc{c}"))
    return df.select(F.col(id_col), *out_cols)


MATMUL_QUANT = 1 << 12  # floor(x * 2^12): exact in double for float32
# inputs; |q| <= 2^13 per component, so a 64-dim dot is < 2^32 —
# far inside int64 (and int32 accumulation in numpy would overflow
# only past 4096 dims at this scale; we accumulate in int64 anyway).

# Hard bound on the exhaustive flat-scan's query-set size: the query
# matrix rides a broadcast and every corpus batch scores against ALL
# of it, so cost is corpus x queries — the regime past this cap
# belongs to the IVF/PQ paths, and silently collecting an unbounded
# relation to the driver would OOM instead of erroring usefully.
MATMUL_MAX_QUERIES = 1024


def int_matmul_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact brute-force top-k by QUANTIZED-INTEGER dot product,
    computed as one numpy matrix multiply per Arrow batch — the
    vectorized fast path for the exhaustive baseline (the shape FAISS
    calls a flat index scan): corpus partitions stream through
    mapInPandas, each batch does ONE int64 matmul against the
    broadcast query matrix, keeps its local top-k per query
    (argpartition), and the tiny per-partition candidate union is
    reduced to the global top-k by an ordinary keyed window.

    Determinism/exactness: scores are integer dots of
    floor(x * 2^12) components (exact in IEEE double for float32
    inputs — same discipline as KMEANS_QUANT), and integer addition
    is associative, so the numpy accumulation order is irrelevant and
    a DuckDB oracle computes the identical integers.  Local-top-k +
    merge is lossless even under boundary ties AND stays bounded:
    each partition keeps exactly k+1 rows per query — everything
    strictly above the boundary score plus the smallest-neighbor-id
    rows tied at it — a superset of the partition's members of the
    global (score DESC, neighbor_id ASC) top-k (score-only
    argpartition could drop a tied row the global tiebreak would
    have ranked in — ADVICE r05; keeping ALL ties would emit
    O(batch) rows on heavily tied data — r6 review).

    Scale shape: corpus never shuffles (candidates only — P*Q*k tiny
    rows); queries ride a shared session broadcast as one small
    ndarray, ENFORCED bounded (<= MATMUL_MAX_QUERIES — the IVF/PQ
    paths own the big-query regime).
    Returns (query_id, neighbor_id, score_q, rank), neighbors != query.
    """
    import numpy as np
    import pandas as pd

    from parquet_to_sql_spark.operators.broadcast_cache import (
        payload_digest,
        shared_broadcast,
    )
    from parquet_to_sql_spark.operators.text import rebalance_for_compute

    qrows = queries.select(id_col, vec_col).limit(
        MATMUL_MAX_QUERIES + 1
    ).collect()
    if not qrows:
        raise ValueError("empty query set")
    if len(qrows) > MATMUL_MAX_QUERIES:
        raise ValueError(
            f"int_matmul_topk is the exhaustive flat-scan baseline and "
            f"caps its query set at {MATMUL_MAX_QUERIES} rows; for large "
            f"query relations use the blocked paths (ivf_topk / "
            f"kmeans_ivf_topk / pq_adc_topk / ivfpq_adc_topk)"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.floor(
        np.array([r[1] for r in qrows], dtype=np.float64) * MATMUL_QUANT
    ).astype(np.int64)
    bc = shared_broadcast(
        df.sparkSession,
        payload_digest(b"int_matmul_topk", qids.tobytes(), qmat.tobytes()),
        lambda: (qids, qmat),
    )

    out_schema = (
        f"query_id long, neighbor_id long, score_q long"
    )

    def score(batches):
        b_qids, b_qmat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.floor(
                np.stack(pdf["_vec"].to_numpy()).astype(np.float64) * MATMUL_QUANT
            ).astype(np.int64)
            scores = mat @ b_qmat.T  # (batch, n_queries) int64
            kk = min(k + 1, len(ids))  # +1 to survive dropping self
            for j in range(len(b_qids)):
                col = scores[:, j]
                if len(col) > kk:
                    # BOUNDED tie-safe selection: all rows strictly
                    # above the kk-th best score (at most kk-1), plus
                    # the smallest-neighbor-id rows tied AT it, filled
                    # to exactly kk rows.  Lossless for the global
                    # (score DESC, neighbor_id ASC) order: if t tied
                    # rows of this partition reach the global top-kk,
                    # they are its t smallest-id tied rows and
                    # t <= kk - |above| (the above-thresh rows all
                    # outrank them).  Keeping every tied row instead
                    # would emit O(batch) rows per query on heavily
                    # tied data (all-zero / quantization-collapsed
                    # vectors), breaking the P*Q*k candidate bound.
                    thresh = np.partition(col, len(col) - kk)[len(col) - kk]
                    above = np.nonzero(col > thresh)[0]
                    tied = np.nonzero(col == thresh)[0]
                    need = kk - len(above)
                    if need < len(tied):
                        tied = tied[np.argsort(ids[tied], kind="stable")[:need]]
                    top = np.concatenate([above, tied])
                else:
                    top = np.arange(len(col))
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(top), b_qids[j], dtype=np.int64),
                        "neighbor_id": ids[top],
                        "score_q": col[top],
                    }
                )

    corpus = rebalance_for_compute(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    )
    cands = corpus.mapInPandas(score, out_schema).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def int_dot_expr(a: str, b: str, quant: int = MATMUL_QUANT):
    """Integer dot product of two float vector columns under
    floor(x*quant) quantization — one JVM zip_with/aggregate fold,
    exact and order-independent (integer addition), mirrored in
    DuckDB by list_dot_product over the same transform."""
    return F.aggregate(
        F.zip_with(
            F.col(a),
            F.col(b),
            lambda x, y: F.floor(x.cast("double") * F.lit(quant)).cast("long")
            * F.floor(y.cast("double") * F.lit(quant)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def mmr_rerank_int(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    pool: int = 8,
    k: int = 3,
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein,
    SIGIR'98, public record) with lambda = 1/2 in EXACT integer
    arithmetic: from each query's top-``pool`` candidates (by
    quantized dot product), greedily select ``k`` results maximizing
    ``relevance - max-similarity-to-already-selected`` — the
    diversity-aware rerank that stops near-duplicate corpus entries
    from filling the whole result list (2*MMR at lambda=1/2 is
    score - max_sim, an integer, so every selection step is an exact
    argmax with ties to the lower id — value-exact cross-engine via
    the unrolled-iteration oracle pattern pagerank established).

    Scale shape: the expensive stage is the pool retrieval
    (int_matmul_topk — corpus never shuffles); the rerank itself
    touches pool*pool rows PER QUERY (tiny), with candidate vectors
    re-attached by one broadcast-able join and all selection rounds
    as unrolled window argmaxes keyed by query.  The pool and the
    pairwise-similarity relations are MATERIALIZED once
    (``localCheckpoint`` — both are queries*pool-bounded, tiny by
    construction) before the greedy unroll: without that, Catalyst
    re-derives the whole matmul + pairwise stage inside every
    selection round (VERDICT r05 measured 25 scans / 47 shuffles at
    k=3) and lineage grows super-linearly in k; with it the corpus is
    scanned a constant ~2 times regardless of k (plan-pinned by
    ``tests/test_scale_features.py``).

    Returns (query_id, position, neighbor_id, mmr2) where mmr2 =
    2*MMR value at selection time (position 1 uses relevance alone).
    """
    from pyspark.sql import Window

    if not 1 <= k <= pool:
        raise ValueError("need 1 <= k <= pool")
    # materialize the pool ONCE: every selection round below references
    # it, and without truncating lineage each round re-runs the corpus
    # matmul (queries*pool rows — tiny, safe to checkpoint eagerly)
    cand = (
        int_matmul_topk(df, id_col, vec_col, queries, k=pool)
        .select("query_id", "neighbor_id", "score_q", "rank")
        .localCheckpoint()
    )
    vecs = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    cand_v = cand.join(vecs, "neighbor_id")
    a = cand_v.select(
        "query_id",
        F.col("neighbor_id").alias("n1"),
        F.col("score_q").alias("s1"),
        F.col("rank").alias("r1"),
        F.col("_nv").alias("v1"),
    )
    b = cand_v.select(
        "query_id",
        F.col("neighbor_id").alias("n2"),
        F.col("_nv").alias("v2"),
    )
    # pairwise sims: queries * pool^2 rows, also referenced by every
    # round — materialize once so the vector join + integer dots run
    # a single time and the loop's lineage stays linear in k
    sims = (
        a.join(b, "query_id")
        .filter(F.col("n1") != F.col("n2"))
        .withColumn("sim", int_dot_expr("v1", "v2"))
        .select("query_id", "n1", "s1", "r1", "n2", "sim")
        .localCheckpoint()
    )

    # selection 1: pure relevance — the pool's rank 1
    sel = cand.filter(F.col("rank") == 1).select(
        "query_id",
        F.lit(1).alias("position"),
        "neighbor_id",
        F.col("score_q").alias("mmr2"),
    )
    picked = sel.select("query_id", F.col("neighbor_id").alias("picked"))
    out = sel
    for pos in range(2, k + 1):
        # candidates not yet picked; 2*MMR = s1 - max(sim to picked)
        remaining = (
            sims.join(
                picked.withColumnRenamed("picked", "n2"), ["query_id", "n2"], "semi"
            )
            .join(
                picked.withColumnRenamed("picked", "n1"),
                ["query_id", "n1"],
                "left_anti",
            )
            .groupBy("query_id", "n1", "s1")
            .agg(F.max("sim").alias("max_sim"))
            .withColumn("mmr2", F.col("s1") - F.col("max_sim"))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("mmr2"), F.col("n1"))
        step = (
            remaining.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                F.lit(pos).alias("position"),
                F.col("n1").alias("neighbor_id"),
                "mmr2",
            )
        )
        out = out.unionByName(step)
        picked = picked.unionByName(
            step.select("query_id", F.col("neighbor_id").alias("picked"))
        )
    return out


def hard_negatives_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    queries: DataFrame,
    centroids: DataFrame,
    pool: int = 16,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training —
    retrieve-then-filter, the standard production recipe: from each
    query's top-``pool`` retrieval candidates (exact quantized-integer
    dot, the flat-scan baseline), DROP candidates assigned to the
    query's own coarse cluster (the likely-positive neighborhood —
    nearest-centroid assignment, same as the IVF family) and return
    the ``k`` highest-scoring survivors: maximally confusable
    negatives that are still outside the positive's semantic cell.

    Deterministic end to end (integer scores, cosine assignment with
    ties to the lower centroid id, rank ties to the lower neighbor
    id), so the whole mine is value-exact cross-engine.  Mining from a
    bounded retrieval pool is the DEFINITION here, not an
    approximation — production miners sample negatives from the top-N
    retrieved, never from an exhaustive out-of-cluster scan.

    Scale shape: int_matmul_topk's budget (corpus never shuffles) +
    broadcast centroid assignment of the query set (tiny) and of the
    corpus + two broadcast-able joins of the pool (queries*pool rows,
    tiny) onto the assignments.  Queries need NOT be corpus members.

    Returns (query_id, neighbor_id, score_q, neg_rank), neg_rank 1..k.
    """
    # assign the QUERY vectors directly (not via a join against the
    # corpus assignment): queries need not be corpus members — with a
    # held-out anchor set, a corpus-side join would silently drop
    # every candidate of an external query (r6 review)
    pool_df = int_matmul_topk(df, id_col, vec_col, queries, k=pool).select(
        "query_id", "neighbor_id", "score_q"
    )
    qcell = ivf_assign(queries, id_col, vec_col, centroids).select(
        F.col(id_col).alias("query_id"), F.col("centroid_id").alias("_qc")
    )
    ncell = ivf_assign(df, id_col, vec_col, centroids).select(
        F.col(id_col).alias("neighbor_id"), F.col("centroid_id").alias("_nc")
    )
    hard = (
        pool_df.join(qcell, "query_id")
        .join(ncell, "neighbor_id")
        .filter(F.col("_nc") != F.col("_qc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.col("neighbor_id")
    )
    return (
        hard.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("query_id", "neighbor_id", "score_q", "neg_rank")
    )

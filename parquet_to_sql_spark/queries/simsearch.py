"""Similarity-search queries over `embeddings`, oracle-checked.

Brute-force cosine top-k is the exactness baseline; IVF is the scale
path (probe nprobe coarse buckets only). Both oracles re-run the
identical algorithm in DuckDB — same left-fold double arithmetic,
same deterministic centroid choice, same tie-breaks — so results
hash-match exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.operators.simsearch import cosine_topk, ivf_topk
from parquet_to_sql_spark.queries.registry import query

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_K = 5
_NPROBE = 3
_CENTROID_MOD = 50  # vec_id % 50 == 0 -> deterministic centroids
_PLANES = 8
_DIMS = 64

_DUCK_COS_AB = """
  list_reduce(list_transform(range(1, len({a})+1), k -> {a}[k]*{b}[k]), (x,y) -> x+y)
  / (sqrt(list_reduce(list_transform({a}, x -> x*x), (x,y) -> x+y))
     * sqrt(list_reduce(list_transform({b}, x -> x*x), (x,y) -> x+y)))
"""

# Shared DuckDB CTE fragments for every IVF-shaped oracle (seeded IVF,
# k-means IVF, SemDeDup blocking, recall audit) — single-sourced so the
# assign/probe semantics can't drift apart across oracles (round-3
# debt item).  All fragments assume a CTE `v(vec_id, ve)` in scope;
# probes additionally assume `q(qid, qv)`.
_DUCK_V_CTE = "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)"


def _duck_cent_seeded() -> str:
    """Deterministic seeded centroids: every _CENTROID_MOD-th vector."""
    return (
        "cent AS (SELECT vec_id AS cent_id, ve AS cv FROM v "
        f"WHERE vec_id % {_CENTROID_MOD} = 0)"
    )


def _duck_assigned_cte(cent: str) -> str:
    """Nearest-centroid assignment of the whole corpus (ties to the
    lower cent_id)."""
    return f"""assigned AS (
      SELECT vec_id, ve, cent_id AS centroid_id FROM (
        SELECT v.vec_id, v.ve, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DUCK_COS_AB.format(a="ve", b="cv")} DESC, c.cent_id
               ) AS rn
        FROM v CROSS JOIN {cent} c
      ) WHERE rn = 1
    )"""


def _duck_probes_cte(cent: str) -> str:
    """Top-_NPROBE probe cells per query (ties to the lower cent_id)."""
    return f"""probes AS (
      SELECT qid, cent_id AS centroid_id FROM (
        SELECT q.qid, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="cv")} DESC, c.cent_id
               ) AS rn
        FROM q CROSS JOIN {cent} c
      ) WHERE rn <= {_NPROBE}
    )"""


def _duck_ivf_tail(cent: str) -> str:
    """The IVF search tail (assign → probe → score → rank) against a
    centroid CTE exposing (cent_id, cv) — shared by the seeded and the
    k-means-refined variants."""
    return f"""
    {_duck_assigned_cte(cent)},
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    {_duck_probes_cte(cent)},
    scored AS (
      SELECT q.qid, a.vec_id AS cid,
             {_DUCK_COS_AB.format(a="qv", b="a.ve")} AS cosine
      FROM q
      JOIN probes ON probes.qid = q.qid
      JOIN assigned a ON a.centroid_id = probes.centroid_id
      WHERE a.vec_id <> q.qid
    ), ranked AS (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, cid AS neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {_K}
    """


@query(
    "simsearch_cosine_topk",
    headline=True,
    tags=("simsearch", "embeddings", "llm-pipeline"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT qid, vec_id AS cid,
             {_DUCK_COS_AB.format(a="qv", b="ve")} AS cosine
      FROM q JOIN v ON vec_id <> qid
    ), ranked AS (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, cid AS neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {_K}
    """,
)
def simsearch_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a small broadcast query set —
    exact kNN baseline; scales linearly in corpus size with zero
    shuffle of the corpus (queries are broadcast)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(emb, "vec_id", "embedding", queries, k=_K)


@query(
    "simsearch_ivf_topk",
    tags=("simsearch", "embeddings", "ann", "llm-pipeline"),
    oracle=(
        f"WITH {_DUCK_V_CTE},\n    "
        + _duck_cent_seeded()
        + ",\n"
        + _duck_ivf_tail("cent")
    ),
)
def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: deterministic centroids
    (vec_id % {mod} == 0), assign once, probe 3 buckets per query.

    The scale story: the centroid table stays tiny and broadcast at
    any corpus size; per-query work drops from O(n) to O(n * nprobe /
    n_centroids)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    centroids = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    return ivf_topk(
        emb, "vec_id", "embedding", queries, centroids, k=_K, nprobe=_NPROBE
    )


_RRF_POOL = 20
_RRF_K = 60

_DUCK_L2SQ = (
    "list_reduce(list_transform(range(1, len({a})+1), "
    "k -> ({a}[k]-{b}[k])*({a}[k]-{b}[k])), (x,y) -> x+y)"
)


@query(
    "simsearch_rrf_fusion",
    tags=("simsearch", "embeddings", "rank-fusion", "llm-pipeline"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT qid, vec_id AS cid,
             {_DUCK_COS_AB.format(a="qv", b="ve")} AS cosine,
             {_DUCK_L2SQ.format(a="qv", b="ve")} AS l2sq
      FROM q JOIN v ON vec_id <> qid
    ), ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS r_cos,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2sq ASC, cid) AS r_l2
      FROM scored
    ), fused AS (
      SELECT qid, cid,
             CAST(
               (CASE WHEN r_cos <= {_RRF_POOL}
                     THEN CAST(floor(1000000.0/({_RRF_K}+r_cos)) AS BIGINT)
                     ELSE 0 END)
             + (CASE WHEN r_l2 <= {_RRF_POOL}
                     THEN CAST(floor(1000000.0/({_RRF_K}+r_l2)) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS rrf_score
      FROM ranked
    )
    SELECT qid AS query_id, cid AS neighbor_id, rrf_score,
           CAST(rk AS INT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY rrf_score DESC, cid) AS rk
      FROM fused WHERE rrf_score > 0
    ) WHERE rk <= {_K}
    """,
)
def simsearch_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers (cosine ranking +
    Euclidean ranking) over the same broadcast query set — the
    standard ensemble step in production retrieval, needing only
    ranks, never score calibration.  Fused scores are pure integer
    arithmetic (floor of one IEEE division), so the result is
    value-exact cross-engine; one scored relation feeds both rankings
    (one exchange, two sorts — no second corpus scan, no outer
    join)."""
    from parquet_to_sql_spark.operators.simsearch import rrf_fuse_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return rrf_fuse_topk(
        emb, "vec_id", "embedding", queries, k=_K, pool=_RRF_POOL, rrf_k=_RRF_K
    )


_KMEANS_ITERS = 2
_KMEANS_QUANT = 1 << 30


def _duck_kmeans_ctes(iterations: int) -> str:
    """Unrolled Lloyd iterations: assign → integer-quantized
    dimension means → rebuild centroid lists. Mirrors
    operators.simsearch.kmeans_refine exactly (floor(x*2^30) BIGINT
    sums; one IEEE division at the end)."""
    parts = [
        f"cent0 AS (SELECT vec_id AS cent_id, ve AS cv FROM v "
        f"WHERE vec_id % {_CENTROID_MOD} = 0)"
    ]
    for i in range(iterations):
        prev = f"cent{i}"
        parts.append(f"""
    a{i} AS (
      SELECT vec_id, ve, cent_id AS centroid_id FROM (
        SELECT v.vec_id, v.ve, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DUCK_COS_AB.format(a="ve", b="cv")} DESC, c.cent_id
               ) AS rn
        FROM v CROSS JOIN {prev} c
      ) WHERE rn = 1
    )""")
        parts.append(f"""
    m{i} AS (
      SELECT centroid_id, d,
             CAST(SUM(CAST(FLOOR(ve[d] * {float(_KMEANS_QUANT)}) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * {float(_KMEANS_QUANT)}) AS m
      FROM a{i} CROSS JOIN (SELECT unnest(range(1, {_DIMS + 1})) AS d) dims
      GROUP BY centroid_id, d
    )""")
        parts.append(f"""
    cent{i + 1} AS (
      SELECT centroid_id AS cent_id, list(m ORDER BY d) AS cv
      FROM m{i} GROUP BY centroid_id
    )""")
    return ",\n".join(parts)


@query(
    "simsearch_ivf_kmeans_topk",
    tags=("simsearch", "embeddings", "ann", "kmeans", "llm-pipeline", "scale-path"),
    oracle=(
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),\n"
        + _duck_kmeans_ctes(_KMEANS_ITERS)
        + ",\n"
        + _duck_ivf_tail(f"cent{_KMEANS_ITERS}")
    ),
)
def simsearch_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with LEARNED centroids: the seeded picks are refined
    by 2 distributed Lloyd iterations (posexplode + one groupBy per
    step — never a per-cluster collect), then searched with the same
    probe plan as simsearch_ivf_topk. Quantized integer means keep the
    whole refinement bit-identical to the SQL oracle; see
    operators.simsearch.kmeans_refine."""
    from parquet_to_sql_spark.operators.simsearch import kmeans_refine

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    seeds = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    # cache: the refined centroid table is tiny and feeds both the
    # corpus assignment and the query probes
    cent = kmeans_refine(
        emb, "vec_id", "embedding", seeds, iterations=_KMEANS_ITERS
    ).cache()
    return ivf_topk(emb, "vec_id", "embedding", queries, cent, k=_K, nprobe=_NPROBE)


@query(
    "embedding_norm_stats",
    tags=("embeddings", "llm-pipeline"),
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           MIN(sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                                (a,b) -> a+b))) AS min_norm,
           MAX(sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x),
                                (a,b) -> a+b))) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column hygiene stats: L2 norm range per label (min/max
    are order-independent, so doubles compare exactly)."""
    from parquet_to_sql_spark.operators.simsearch import norm_expr

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min(norm_expr("embedding")).alias("min_norm"),
        F.max(norm_expr("embedding")).alias("max_norm"),
    )


def _duck_hyperplane_dot(p: int) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_DIMS + 1}), "
        f"d -> ve[d] * CAST(((CAST(1103515245 AS BIGINT)*({p * 64} + d) + 12345) "
        f"% 2147483648) - 1073741824 AS DOUBLE)), (a, b) -> a + b)"
    )


_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN {_duck_hyperplane_dot(p)} > 0 THEN {1 << p} ELSE 0 END)"
    for p in range(_PLANES)
)


@query(
    "simsearch_hyperplane_lsh",
    tags=("simsearch", "embeddings", "lsh", "llm-pipeline"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    bucketed AS (SELECT vec_id, CAST({_DUCK_BUCKET} AS BIGINT) AS bucket FROM v)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec_id
    FROM bucketed GROUP BY bucket
    """,
)
def simsearch_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing over embeddings (8 sign bits ->
    256 buckets): the cosine-space analogue of MinHash banding.
    Candidate near-dup pairs share a bucket, so pair generation is an
    equality join on `bucket` — the 100 TB-safe path for embedding
    dedup, feeding the exact cosine verifier."""
    from parquet_to_sql_spark.operators.simsearch import hyperplane_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id", hyperplane_bucket(F.col("embedding"), _PLANES, _DIMS).alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec_id"),
    )


@query(
    "dedup_embedding_lsh_verified",
    tags=("dedup", "embeddings", "lsh", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    bucketed AS (SELECT vec_id, CAST({_DUCK_BUCKET} AS BIGINT) AS bucket, ve FROM v),
    cand AS (
      SELECT a.vec_id AS id1, b.vec_id AS id2, a.ve AS ave, b.ve AS bve
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id1, id2,
           {_DUCK_COS_AB.format(a="ave", b="bve")} AS cosine
    FROM cand
    WHERE {_DUCK_COS_AB.format(a="ave", b="bve")} >= 0.2
    """,
)
def dedup_embedding_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, scale path end-to-end: hyperplane-LSH
    bucket join generates candidates (equality join, no n² pairing),
    then exact cosine verifies each candidate. Recall is bounded by
    bucket collisions (similar vectors share all 8 sign bits with high
    probability); precision is exact because every emitted pair is
    re-scored."""
    from parquet_to_sql_spark.operators.simsearch import (
        cosine_expr,
        hyperplane_bucket,
        norm_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # both join sides reference this; the bucket is ~512 fold ops per
    # row, so materialize once instead of sketching the corpus twice
    bucketed = emb.select(
        "vec_id",
        F.col("embedding"),
        hyperplane_bucket(F.col("embedding"), _PLANES, _DIMS).alias("bucket"),
    ).localCheckpoint()
    a = bucketed.select(
        F.col("vec_id").alias("a_vec_id"), F.col("embedding").alias("a_vec"),
        norm_expr(F.col("embedding")).alias("a_norm"), "bucket",
    )
    b = bucketed.select(
        F.col("vec_id").alias("b_vec_id"), F.col("embedding").alias("b_vec"),
        norm_expr(F.col("embedding")).alias("b_norm"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a_vec_id") < F.col("b_vec_id"))
        .withColumn("cosine", cosine_expr("a_vec", "b_vec", "a_norm", "b_norm"))
        .filter(F.col("cosine") >= 0.2)
        .select(
            F.col("a_vec_id").alias("id1"),
            F.col("b_vec_id").alias("id2"),
            "cosine",
        )
    )


@query(
    "embedding_quantize_int8",
    tags=("embeddings", "quantization", "llm-pipeline"),
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    m AS (SELECT vec_id, ve,
                 list_max(list_transform(ve, x -> abs(x))) AS maxabs FROM v),
    q AS (SELECT vec_id,
                 CASE WHEN maxabs = 0
                      THEN list_transform(ve, x -> CAST(0 AS BIGINT))
                      ELSE list_transform(ve, x -> CAST(floor(x * 127.0 / maxabs) AS BIGINT))
                 END AS qv
          FROM m)
    SELECT vec_id,
           CAST(len(qv) AS INT)            AS n_dims,
           CAST(list_min(qv) AS BIGINT)    AS q_min,
           CAST(list_max(qv) AS BIGINT)    AS q_max,
           CAST(list_sum(qv) AS BIGINT)    AS q_sum,
           CAST(len(list_filter(qv, x -> x >= 127 OR x <= -127)) AS INT) AS n_clip
    FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization audit — the vector-compression step
    an ANN serving path runs before building IVF/LSH indexes (4x less
    memory and shuffle bandwidth than float32; scale factor = per-
    vector max-abs kept as metadata).  Quantizer is floor(x*127/maxabs)
    rather than round() because floor of an IEEE division is bit-exact
    across engines (round-half modes differ).  All outputs are
    integers; the whole thing is JVM array expressions — no UDF, no
    shuffle (narrow map over the scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    qv = F.when(
        maxabs == F.lit(0.0), F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x * F.lit(127.0) / maxabs))
    )
    return emb.select("vec_id", qv.alias("qv")).select(
        "vec_id",
        F.size("qv").alias("n_dims"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.size(
            F.filter("qv", lambda x: (x >= 127) | (x <= -127))
        ).alias("n_clip"),
    )


@query(
    "dedup_embedding_ivf_blocked",
    tags=("dedup", "embeddings", "ann", "kmeans", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH {_DUCK_V_CTE},
    {_duck_cent_seeded()},
    {_duck_assigned_cte("cent")},
    cand AS (
      SELECT a.centroid_id, a.vec_id AS id1, b.vec_id AS id2,
             a.ve AS ave, b.ve AS bve
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    )
    SELECT centroid_id, id1, id2,
           {_DUCK_COS_AB.format(a="ave", b="bve")} AS cosine
    FROM cand
    WHERE {_DUCK_COS_AB.format(a="ave", b="bve")} >= 0.2
    """,
)
def dedup_embedding_ivf_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup-shaped (Abbas et al. 2023, public):
    cluster the embedding space (IVF cells from the deterministic
    seeds), then compare pairs ONLY within a cell — the k-means-
    blocked alternative to the hyperplane-LSH candidate generator in
    `dedup_embedding_lsh_verified`, preferred when the corpus has
    real cluster structure (cells adapt to density; fixed hyperplane
    buckets don't).

    Scale shape: assignment is one broadcast join against <=K
    centroids; pair cost is sum over cells of occupancy^2, bounded by
    growing K with the corpus (K ~ n/target_cell_size keeps occupancy
    constant — the knob the LSH variant lacks).  Every candidate is
    exact-verified with the same IEEE left-fold cosine, so precision
    is exact and the oracle hash-matches."""
    from parquet_to_sql_spark.operators.simsearch import (
        cosine_expr,
        ivf_assign,
        norm_expr,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    # cached: the assigned relation feeds BOTH sides of the cell join
    assigned = ivf_assign(emb, "vec_id", "embedding", seeds).cache()
    a = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id1"),
        F.col("embedding").alias("ave"),
        norm_expr("embedding").alias("a_norm"),
    )
    b = assigned.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("id2"),
        F.col("embedding").alias("bve"),
        norm_expr("embedding").alias("b_norm"),
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cosine_expr("ave", "bve", "a_norm", "b_norm"))
        .filter(F.col("cosine") >= 0.2)
        .select("centroid_id", "id1", "id2", "cosine")
    )


# --- Product quantization (ADC) -----------------------------------------

_PQ_SUBS = 8
_PQ_SUBDIM = 8
_PQ_CODE_LO, _PQ_CODE_HI = 100, 116  # 16 deterministic codebook seeds


def _duck_sub_l2(a: str, b: str, s: int) -> str:
    lo, hi = s * _PQ_SUBDIM + 1, (s + 1) * _PQ_SUBDIM + 1
    return (
        f"list_reduce(list_transform(range({lo}, {hi}), "
        f"d -> ({a}[d]-{b}[d])*({a}[d]-{b}[d])), (x,y) -> x+y)"
    )


def _duck_pq_oracle() -> str:
    pair_d = ",\n             ".join(
        f"{_duck_sub_l2('v.ve', 'c.cv', s)} AS d{s}" for s in range(_PQ_SUBS)
    )
    encs = ",\n    ".join(
        f"enc{s} AS (SELECT vec_id, code_id AS c{s} FROM pairs "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{s}, code_id) = 1)"
        for s in range(_PQ_SUBS)
    )
    enc_join = " ".join(f"JOIN enc{s} USING (vec_id)" for s in range(1, _PQ_SUBS))
    dt_d = ",\n             ".join(
        f"{_duck_sub_l2('q.ve', 'c.cv', s)} AS d{s}" for s in range(_PQ_SUBS)
    )
    # one correlated scalar lookup per subspace: DuckDB unnests each
    # into a clean equi-join (an explicit 8-way join chain sent its
    # join-order planner into a cross-product search that never
    # finished); the + chain keeps the float sum order identical to
    # the Spark expression
    approx = " + ".join(
        f"(SELECT d{s} FROM dt WHERE dt.qid = q.qid AND dt.code_id = e.c{s})"
        for s in range(_PQ_SUBS)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    codes AS (SELECT vec_id AS code_id, ve AS cv FROM v
              WHERE vec_id >= {_PQ_CODE_LO} AND vec_id < {_PQ_CODE_HI}),
    pairs AS (
      SELECT v.vec_id, c.code_id,
             {pair_d}
      FROM v CROSS JOIN codes c
    ),
    {encs},
    enc AS (SELECT * FROM enc0 {enc_join}),
    dt AS (
      SELECT q.vec_id AS qid, c.code_id,
             {dt_d}
      FROM v q CROSS JOIN codes c WHERE q.vec_id < {_N_QUERIES}
    ),
    adc AS (
      SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
             {approx} AS approx_l2sq
      FROM enc e CROSS JOIN (SELECT DISTINCT qid FROM dt) q
      WHERE e.vec_id <> q.qid
    )
    SELECT query_id, neighbor_id, approx_l2sq, CAST(rk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_l2sq ASC, neighbor_id) AS rk
      FROM adc
    ) WHERE rk <= {_K}
    """


def _duck_ivfpq_oracle() -> str:
    """IVF-PQ mirror: coarse assign -> residuals -> shared residual
    codebook -> per-subspace arg-min encode -> probes -> per-(query,
    centroid) distance table -> correlated-lookup ADC sum."""
    pair_d = ",\n             ".join(
        f"{_duck_sub_l2('r.rve', 'c.cv', s)} AS d{s}" for s in range(_PQ_SUBS)
    )
    encs = ",\n    ".join(
        f"enc{s} AS (SELECT vec_id, centroid_id, code_id AS c{s} FROM pairs "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{s}, code_id) = 1)"
        for s in range(_PQ_SUBS)
    )
    enc_join = " ".join(f"JOIN enc{s} USING (vec_id)" for s in range(1, _PQ_SUBS))
    dt_d = ",\n             ".join(
        f"{_duck_sub_l2('qr.rq', 'c.cv', s)} AS d{s}" for s in range(_PQ_SUBS)
    )
    approx = " + ".join(
        f"(SELECT d{s} FROM dt WHERE dt.qid = p.qid"
        f" AND dt.centroid_id = e.centroid_id AND dt.code_id = e.c{s})"
        for s in range(_PQ_SUBS)
    )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, ve AS cv FROM v WHERE vec_id % {_CENTROID_MOD} = 0),
    assigned AS (
      SELECT vec_id, ve, cent_id AS centroid_id, cv AS centv FROM (
        SELECT v.vec_id, v.ve, c.cent_id, c.cv,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_DUCK_COS_AB.format(a="ve", b="cv")} DESC, c.cent_id
               ) AS rn
        FROM v CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    res AS (
      SELECT vec_id, centroid_id,
             list_transform(range(1, {_DIMS + 1}), d -> ve[d] - centv[d]) AS rve
      FROM assigned
    ),
    codes AS (SELECT vec_id AS code_id, rve AS cv FROM res
              WHERE vec_id >= {_PQ_CODE_LO} AND vec_id < {_PQ_CODE_HI}),
    pairs AS (
      SELECT r.vec_id, r.centroid_id, c.code_id,
             {pair_d}
      FROM res r CROSS JOIN codes c
    ),
    {encs},
    enc AS (SELECT enc0.vec_id, enc0.centroid_id,
                   c0{"".join(f", c{s}" for s in range(1, _PQ_SUBS))}
            FROM enc0 {enc_join}),
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT qid, cent_id AS centroid_id FROM (
        SELECT q.qid, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="cv")} DESC, c.cent_id
               ) AS rn
        FROM q CROSS JOIN cent c
      ) WHERE rn <= {_NPROBE}
    ),
    qres AS (
      SELECT p.qid, p.centroid_id,
             list_transform(range(1, {_DIMS + 1}), d -> qv[d] - cv[d]) AS rq
      FROM probes p
      JOIN q ON q.qid = p.qid
      JOIN cent ON cent.cent_id = p.centroid_id
    ),
    dt AS (
      SELECT qr.qid, qr.centroid_id, c.code_id,
             {dt_d}
      FROM qres qr CROSS JOIN codes c
    ),
    adc AS (
      SELECT p.qid AS query_id, e.vec_id AS neighbor_id,
             {approx} AS approx_l2sq
      FROM enc e JOIN probes p ON p.centroid_id = e.centroid_id
      WHERE e.vec_id <> p.qid
    )
    SELECT query_id, neighbor_id, approx_l2sq, CAST(rk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY approx_l2sq ASC, neighbor_id) AS rk
      FROM adc
    ) WHERE rk <= {_K}
    """


@query(
    "simsearch_ivfpq_adc_topk",
    tags=("simsearch", "embeddings", "ann", "quantization", "llm-pipeline", "scale-path"),
    oracle=_duck_ivfpq_oracle(),
)
def simsearch_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN — the production index shape (FAISS ``IVFPQ``;
    Jégou et al., TPAMI 2011, public): a coarse quantizer routes
    vectors to inverted lists, PQ compresses the RESIDUAL
    (vector - centroid) to 8 code bytes, and ADC scores candidates in
    probed cells only, from a per-(query, probed-centroid) distance
    table.  Combines the two scale levers demonstrated separately by
    `simsearch_ivf_topk` (probe pruning: search cost ~ nprobe/K) and
    `simsearch_pq_adc_topk` (memory: 8 bytes/vector): at 100 TB both
    are mandatory.  Corpus is never shuffled — coarse assign is a
    broadcast join, residuals a narrow map, encode one broadcast cross
    join + groupBy arg-min, scoring 8 broadcast joins; candidates in
    unprobed cells are pruned by the first join.  Residual arithmetic
    and fixed-order ADC sums keep the result hash-exact vs the SQL
    oracle."""
    from parquet_to_sql_spark.operators.simsearch import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    centroids = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    return ivfpq_adc_topk(
        emb, "vec_id", "embedding", queries, centroids,
        codes_filter=(F.col("vec_id") >= _PQ_CODE_LO)
        & (F.col("vec_id") < _PQ_CODE_HI),
        k=_K, nprobe=_NPROBE,
    )


@query(
    "simsearch_pq_adc_topk",
    headline=True,
    tags=("simsearch", "embeddings", "ann", "quantization", "llm-pipeline", "scale-path"),
    oracle=_duck_pq_oracle(),
)
def simsearch_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scoring
    (Jégou et al., TPAMI 2011, public): vectors are compressed to 8
    one-byte-scale code ids (8 bytes vs 256 float bytes — the memory
    bound that makes billion-vector serving feasible), queries stay
    full-precision, and candidate distances are sums of 8 entries
    from a broadcast (query, code) distance table — no float vector is
    touched per candidate.  Codebooks are the deterministic seed
    slice vec_id in [100, 116).  The subspace arg-min uses the
    min(struct) trick (ties to lower code id) and the ADC sum is one
    fixed-order expression, so the whole pipeline is value-exact
    against the SQL oracle.  Plan: one broadcast cross join + one
    groupBy to encode, then 8 broadcast hash joins to score — the
    corpus is never shuffled."""
    from parquet_to_sql_spark.operators.simsearch import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    codes = emb.filter(
        (F.col("vec_id") >= _PQ_CODE_LO) & (F.col("vec_id") < _PQ_CODE_HI)
    ).select("vec_id", "embedding")
    return pq_adc_topk(emb, "vec_id", "embedding", queries, codes, k=_K)


@query(
    "embedding_gram_matrix",
    headline=True,
    tags=("embeddings", "linear-algebra", "llm-pipeline", "scale-path"),
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qs
      FROM embeddings
    ), ex AS (
      SELECT vec_id, unnest(qs) AS qv,
             generate_subscripts(qs, 1) - 1 AS i
      FROM q
    )
    SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
           CAST(SUM(a.qv * b.qv) AS BIGINT) AS q_sum
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
    GROUP BY a.i, b.i
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus gram matrix (upper triangle) over quantized embeddings —
    the one-pass sufficient statistic feeding PCA / covariance /
    whitening (operators.simsearch.pca_project eigensolves it on the
    driver).  The d(d+1)/2 pair expansion is map-side (each row
    posexplodes its OWN array twice — no join), the single shuffle
    partial-aggregates to at most d^2 rows per map task, and the
    output is O(d^2) regardless of corpus size.  floor(x * 2^20)
    quantization makes every product an int64 so the sum is
    cross-engine exact (the established power-of-two-scaling
    discipline)."""
    from parquet_to_sql_spark.operators.simsearch import gram_quantized_upper

    emb = load_table(spark, sf_dir, "embeddings")
    g = gram_quantized_upper(emb, "embedding")
    return g.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("q_sum").cast("long").alias("q_sum"),
    )


@query(
    "simsearch_knn_classify",
    tags=("simsearch", "embeddings", "knn", "llm-pipeline"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, ve AS qv, label AS qlabel
          FROM v WHERE vec_id % 100 = 0),
    c AS (SELECT vec_id, ve, label FROM v WHERE vec_id % 100 != 0),
    scored AS (
      SELECT q.qid, q.qlabel, c.vec_id AS cid, c.label,
             {_DUCK_COS_AB.format(a="qv", b="ve")} AS cosine
      FROM q JOIN c ON true
    ),
    ranked AS (
      SELECT qid, qlabel, cid, label,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored
    ),
    votes AS (
      SELECT qid, qlabel, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM ranked WHERE rank <= 7
      GROUP BY qid, qlabel, label
    )
    SELECT qid AS query_id, CAST(qlabel AS INT) AS true_label,
           CAST(label AS INT) AS predicted_label, votes
    FROM votes
    QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label) = 1
    """,
)
def simsearch_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label prediction — the retrieval end-use: each held-out
    vector (vec_id % 100 = 0) takes a majority vote over its 7 exact
    cosine neighbors in the labeled corpus, ties to the smallest
    label via the sortless argmax pattern (max over (votes, -label)
    structs, map-side combinable).  Scale shape: the query side
    broadcasts (cosine_topk — corpus never shuffles), the tiny
    neighbor list broadcasts back onto the corpus for label lookup,
    and the vote argmax is one partial-aggregated groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    nn = cosine_topk(corpus, "vec_id", "embedding", queries, k=7)
    labels = corpus.select(F.col("vec_id").alias("neighbor_id"), "label")
    voted = (
        F.broadcast(nn)
        .join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = (
        voted.groupBy("query_id")
        .agg(F.max(F.struct(F.col("votes"), (-F.col("label")).alias("nl"))).alias("m"))
        .select(
            "query_id",
            (-F.col("m.nl")).cast("int").alias("predicted_label"),
            F.col("m.votes").alias("votes"),
        )
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").cast("int").alias("true_label")
    )
    return best.join(F.broadcast(truth), "query_id").select(
        "query_id", "true_label", "predicted_label", "votes"
    )


@query(
    "simsearch_recall_audit",
    tags=("simsearch", "embeddings", "evaluation", "llm-pipeline"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    brute AS (
      SELECT qid, cid FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (
                 PARTITION BY qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="ve")} DESC, vec_id) AS rank
        FROM q JOIN v ON vec_id <> qid
      ) WHERE rank <= {_K}
    ),
    {_duck_cent_seeded()},
    {_duck_assigned_cte("cent")},
    {_duck_probes_cte("cent")},
    ivf AS (
      SELECT qid, cid FROM (
        SELECT q.qid, a.vec_id AS cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="a.ve")} DESC, a.vec_id) AS rank
        FROM q
        JOIN probes ON probes.qid = q.qid
        JOIN assigned a ON a.centroid_id = probes.centroid_id
        WHERE a.vec_id <> q.qid
      ) WHERE rank <= {_K}
    )
    SELECT b.qid AS query_id,
           CAST(COUNT(i.cid) AS BIGINT) AS n_recalled,
           CAST({_K} AS BIGINT) AS k
    FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.cid = b.cid
    GROUP BY b.qid
    """,
)
def simsearch_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute force, computed
    IN-QUERY as exact integers (|approx ∩ exact| per query) — the
    evaluation loop every ANN deployment runs on a sampled query set
    before trusting the index, here expressed as one plan over the
    same two operators the retrieval queries use.  At 100 TB the
    audit runs on a small query sample while both candidate paths
    keep their own scale shapes (broadcast queries; bucketed probe)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    centroids = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    brute = cosine_topk(emb, "vec_id", "embedding", queries, k=_K).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_topk(
        emb, "vec_id", "embedding", queries, centroids, k=_K, nprobe=_NPROBE
    ).select(F.col("query_id").alias("i_qid"), F.col("neighbor_id").alias("i_nid"))
    j = brute.join(
        ivf,
        (F.col("query_id") == F.col("i_qid"))
        & (F.col("neighbor_id") == F.col("i_nid")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("i_nid").alias("n_recalled"),
        F.lit(_K).cast("long").alias("k"),
    )


@query(
    "simsearch_filtered_topk",
    tags=("simsearch", "embeddings", "filtered-ann", "llm-pipeline"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, ve AS qv, label AS qlabel
          FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.qid, c.vec_id AS cid,
             {_DUCK_COS_AB.format(a="qv", b="ve")} AS cosine
      FROM q JOIN v c ON c.label = q.qlabel AND c.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, cid, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, cid AS neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {_K}
    """,
)
def simsearch_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search — the production ANN feature
    every vector store names (pre-filter semantics): each query's
    candidate set is restricted to corpus vectors sharing its label
    BEFORE ranking, so top-k is over the filtered universe, not
    post-filtered from an unfiltered top-k (which under-returns when
    the filter is selective).  Expressed as an equality predicate ON
    the candidate join: the filter rides the same broadcast join as
    the scoring, and at scale a label-partitioned corpus layout turns
    it into partition pruning."""
    from parquet_to_sql_spark.operators.simsearch import cosine_expr, with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    q = with_norm(emb.filter(F.col("vec_id") < _N_QUERIES), "vec_id", "embedding", prefix="q")
    ql = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id2"), F.col("label").alias("qlabel")
    )
    q = q.join(F.broadcast(ql), q["q_vec_id"] == ql["q_vec_id2"]).drop("q_vec_id2")
    c = with_norm(emb, "vec_id", "embedding", prefix="c", rebalance=True)
    cl = emb.select(F.col("vec_id").alias("c_vec_id2"), F.col("label").alias("clabel"))
    c = c.join(cl, c["c_vec_id"] == cl["c_vec_id2"]).drop("c_vec_id2")
    scored = (
        F.broadcast(q)
        .join(c, (F.col("clabel") == F.col("qlabel")) & (F.col("q_vec_id") != F.col("c_vec_id")))
        .withColumn("cosine", cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.col("c_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select(
            F.col("q_vec_id").alias("query_id"),
            F.col("c_vec_id").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


@query(
    "simsearch_int_matmul_topk",
    tags=("simsearch", "embeddings", "vectorized", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 4096) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS qid, qv AS qq FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT qid, vec_id AS cid,
             CAST(list_dot_product(qq, qv) AS BIGINT) AS score_q
      FROM qs JOIN v ON vec_id <> qid
    ),
    ranked AS (
      SELECT qid, cid, score_q,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score_q DESC, cid) AS rank
      FROM scored
    )
    SELECT qid AS query_id, cid AS neighbor_id, score_q,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_K}
    """,
)
def simsearch_int_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive top-k as ONE integer matrix multiply per Arrow
    batch (operators.simsearch.int_matmul_topk) — the vectorized
    numpy fast path for the flat-scan baseline, exact by
    construction: floor(x*2^12) quantization makes every score an
    integer dot whose accumulation order cannot matter, so the
    brute-force answer hash-matches the SQL oracle while the hot loop
    is BLAS-shaped instead of per-pair Column folds.  Corpus never
    shuffles; only P*Q*k candidate rows reach the final merge
    window."""
    from parquet_to_sql_spark.operators.simsearch import int_matmul_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return int_matmul_topk(emb, "vec_id", "embedding", queries, k=_K)


def _duck_mmr_oracle(pool: int, k: int, n_queries: int) -> str:
    """Unrolled MMR oracle (lambda=1/2, 2*MMR integers): pool by
    quantized dot, per-round argmax with ties to the lower id —
    the pagerank-style unrolled-iteration oracle applied to greedy
    selection."""
    rounds = []
    for t in range(2, k + 1):
        prev = f"picked{t-1}"
        rounds.append(f"""
    rem{t} AS (
      SELECT s.qid, s.n1, s.s1, s.s1 - MAX(s.sim) AS mmr2
      FROM sims s
      WHERE EXISTS (SELECT 1 FROM {prev} p
                    WHERE p.qid = s.qid AND p.picked = s.n2)
        AND NOT EXISTS (SELECT 1 FROM {prev} p
                        WHERE p.qid = s.qid AND p.picked = s.n1)
      GROUP BY s.qid, s.n1, s.s1
    ),
    sel{t} AS (
      SELECT qid, n1 AS picked, mmr2 FROM rem{t}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY mmr2 DESC, n1) = 1
    ),
    picked{t} AS (
      SELECT qid, picked FROM {prev}
      UNION ALL SELECT qid, picked FROM sel{t}
    )""")
    finals = ["SELECT qid AS query_id, 1 AS position, picked AS neighbor_id,"
              " mmr2 FROM sel1"]
    for t in range(2, k + 1):
        finals.append(
            f"SELECT qid, {t}, picked, mmr2 FROM sel{t}"
        )
    return f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 4096) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS qid, qv AS qq FROM v WHERE vec_id < {n_queries}),
    scored AS (
      SELECT qid, vec_id AS cid,
             CAST(list_dot_product(qq, qv) AS BIGINT) AS s
      FROM qs JOIN v ON vec_id <> qid
    ),
    pool AS (
      SELECT qid, cid, s,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, cid) AS rank
      FROM scored QUALIFY rank <= {pool}
    ),
    sims AS (
      SELECT p1.qid, p1.cid AS n1, p1.s AS s1, p2.cid AS n2,
             CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS sim
      FROM pool p1
      JOIN pool p2 ON p1.qid = p2.qid AND p1.cid <> p2.cid
      JOIN v a ON a.vec_id = p1.cid
      JOIN v b ON b.vec_id = p2.cid
    ),
    sel1 AS (SELECT qid, cid AS picked, s AS mmr2 FROM pool WHERE rank = 1),
    picked1 AS (SELECT qid, picked FROM sel1),{",".join(rounds)}
    {" UNION ALL ".join(finals)}
    """


@query(
    "simsearch_mmr_rerank",
    tags=("simsearch", "embeddings", "rerank", "diversity", "llm-pipeline"),
    oracle=_duck_mmr_oracle(pool=8, k=3, n_queries=_N_QUERIES),
)
def simsearch_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware top-k: Maximal Marginal Relevance reranking
    (lambda = 1/2) over each query's top-8 pool — greedy selection
    maximizing relevance minus similarity-to-already-selected, so a
    cluster of near-identical corpus entries cannot fill the result
    list (the retrieval-for-RAG dedup step).  Everything is exact
    integer arithmetic (quantized dots; 2*MMR = score - max_sim), so
    the greedy argmax chain matches the unrolled DuckDB oracle
    bit-for-bit — the pagerank pattern applied to greedy selection.
    See operators.simsearch.mmr_rerank_int for the scale shape (pool
    retrieval is the distributed stage; rerank touches pool^2 rows
    per query)."""
    from parquet_to_sql_spark.operators.simsearch import mmr_rerank_int

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return mmr_rerank_int(emb, "vec_id", "embedding", queries, pool=8, k=3)


_HN_POOL = 16


@query(
    "simsearch_hard_negatives",
    tags=("simsearch", "embeddings", "training-data", "llm-pipeline",
          "scale-path"),
    oracle=f"""
    WITH {_DUCK_V_CTE},
    {_duck_cent_seeded()},
    {_duck_assigned_cte("cent")},
    vq AS (
      SELECT vec_id,
             list_transform(ve, x -> CAST(floor(x * 4096) AS BIGINT)) AS qv
      FROM v
    ),
    qs AS (SELECT vec_id AS qid, qv AS qq FROM vq WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT qid, vec_id AS cid,
             CAST(list_dot_product(qq, qv) AS BIGINT) AS score_q
      FROM qs JOIN vq ON vec_id <> qid
    ),
    pool AS (
      SELECT qid, cid, score_q
      FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY score_q DESC, cid) <= {_HN_POOL}
    ),
    hard AS (
      SELECT p.qid, p.cid, p.score_q
      FROM pool p
      JOIN assigned aq ON aq.vec_id = p.qid
      JOIN assigned an ON an.vec_id = p.cid
      WHERE an.centroid_id <> aq.centroid_id
    )
    SELECT qid AS query_id, cid AS neighbor_id, score_q,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY score_q DESC, cid) AS INT)
             AS neg_rank
    FROM hard
    QUALIFY neg_rank <= {_K}
    """,
)
def simsearch_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training: each
    query's top-{pool} retrieval candidates (exact integer dot, the
    flat-scan baseline) minus everything assigned to the query's own
    coarse cluster (nearest seeded centroid — the likely-positive
    neighborhood), top-k of the survivors.  Retrieve-then-filter is
    the production mining recipe; every step is deterministic
    (integer scores, lower-id tiebreaks) so the mine is value-exact
    cross-engine.  See operators.simsearch.hard_negatives_topk."""
    from parquet_to_sql_spark.operators.simsearch import hard_negatives_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    centroids = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    return hard_negatives_topk(
        emb, "vec_id", "embedding", queries, centroids, pool=_HN_POOL, k=_K
    )


@query(
    "simsearch_mrr_eval",
    tags=("simsearch", "embeddings", "evaluation", "llm-pipeline"),
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
    q AS (SELECT vec_id AS qid, ve AS qv FROM v WHERE vec_id < {_N_QUERIES}),
    truth AS (
      SELECT qid, cid AS true_nn FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (
                 PARTITION BY qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="ve")} DESC, vec_id) AS rank
        FROM q JOIN v ON vec_id <> qid
      ) WHERE rank = 1
    ),
    {_duck_cent_seeded()},
    {_duck_assigned_cte("cent")},
    {_duck_probes_cte("cent")},
    ivf AS (
      SELECT qid, cid, rank FROM (
        SELECT q.qid, a.vec_id AS cid,
               ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY {_DUCK_COS_AB.format(a="qv", b="a.ve")} DESC, a.vec_id) AS rank
        FROM q
        JOIN probes ON probes.qid = q.qid
        JOIN assigned a ON a.centroid_id = probes.centroid_id
        WHERE a.vec_id <> q.qid
      ) WHERE rank <= {_K}
    )
    SELECT t.qid AS query_id,
           t.true_nn,
           (i.cid IS NOT NULL) AS found_at_k,
           CAST(COALESCE(i.rank, 0) AS BIGINT) AS nn_rank,
           CAST(CASE WHEN i.rank IS NOT NULL THEN 1000000 // i.rank
                     ELSE 0 END AS BIGINT) AS rr_ppm
    FROM truth t LEFT JOIN ivf i ON i.qid = t.qid AND i.cid = t.true_nn
    """,
)
def simsearch_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware retrieval evaluation: where does the TRUE nearest
    neighbor (exact brute force, rank 1) land in the IVF index's
    top-k?  Per query: found-at-k, the rank, and the reciprocal rank
    in exact ppm (1e6 // rank; 0 when missed) — averaging rr_ppm gives
    MRR@k, the metric that distinguishes 'recalled somewhere in the
    list' (recall audit) from 'recalled FIRST', which is what matters
    when only the top hit is shown.  Same two operators and scale
    shapes as the retrieval queries (broadcast query set both paths;
    IVF probes only nprobe cells); the truth side needs rank 1 only,
    so at production scale it runs on a sampled query panel exactly
    like the recall audit."""
    from parquet_to_sql_spark.operators.simsearch import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    centroids = emb.filter(F.col("vec_id") % _CENTROID_MOD == 0)
    truth = (
        cosine_topk(emb, "vec_id", "embedding", queries, k=1)
        .filter(F.col("rank") == 1)
        .select("query_id", F.col("neighbor_id").alias("true_nn"))
    )
    ivf = ivf_topk(
        emb, "vec_id", "embedding", queries, centroids, k=_K, nprobe=_NPROBE
    ).select(
        F.col("query_id").alias("i_qid"),
        F.col("neighbor_id").alias("i_nid"),
        F.col("rank").alias("i_rank"),
    )
    j = truth.join(
        ivf,
        (F.col("query_id") == F.col("i_qid"))
        & (F.col("true_nn") == F.col("i_nid")),
        "left",
    )
    return j.select(
        "query_id",
        "true_nn",
        F.col("i_nid").isNotNull().alias("found_at_k"),
        F.coalesce(F.col("i_rank"), F.lit(0)).cast("bigint").alias("nn_rank"),
        F.expr(
            "CAST(CASE WHEN i_rank IS NOT NULL THEN 1000000 div i_rank"
            " ELSE 0 END AS BIGINT)"
        ).alias("rr_ppm"),
    )


_MAT_DIMS = (32, 16, 8)  # matryoshka truncation depths (full = 64)


def _duck_mat_recall() -> str:
    full = f"""
    v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 4096) AS BIGINT)) AS qv
      FROM embeddings
    ),
    qs AS (SELECT vec_id AS qid, qv AS qq FROM v WHERE vec_id < {_N_QUERIES}),
    pairs AS (SELECT qid, qq, vec_id AS cid, qv AS cv
              FROM qs JOIN v ON vec_id <> qid),
    gt AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY list_dot_product(qq, cv) DESC, cid) AS r
        FROM pairs) WHERE r <= {_K}
    )"""
    per_dim = []
    for d in _MAT_DIMS:
        per_dim.append(f"""
    t{d} AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY list_dot_product(qq[1:{d}], cv[1:{d}]) DESC, cid) AS r
        FROM pairs) WHERE r <= {_K}
    ),
    r{d} AS (
      SELECT {d} AS trunc_dim, CAST(COUNT(*) AS BIGINT) AS recall_hits
      FROM t{d} JOIN gt USING (qid, cid)
    )""")
    union = " UNION ALL ".join(
        f"SELECT CAST(trunc_dim AS INT) AS trunc_dim, recall_hits, "
        f"CAST({_N_QUERIES * _K} AS BIGINT) AS n_possible FROM r{d}"
        for d in _MAT_DIMS
    )
    return "WITH " + full + "," + ",".join(per_dim) + "\n" + union


@query(
    "simsearch_matryoshka_recall",
    tags=("simsearch", "embeddings", "eval", "llm-pipeline"),
    oracle=_duck_mat_recall(),
)
def simsearch_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA truncation audit (Kusupati et al. 2022, public
    record): how much of the full-dimension top-k survives when the
    search uses only the first 32/16/8 of the 64 embedding dimensions
    — the measurement behind the storage/recall dial every
    vector-index deployment tunes (truncate to d dims = d/64 of the
    index bytes).  Scores are floor(x*4096) integer dots (the
    repo's exact-by-construction recipe), ground truth is the full-
    dim top-{_K} per query, and recall_hits counts exact (query,
    neighbor) membership — all integers, DuckDB-mirrored.

    Scale shape: one corpus pass per truncation depth over the same
    broadcast-query candidate relation (prefix dots share the pair
    join); only Q*k rows per depth survive the rank window.  At
    production scale the truncated search runs against the IVF/PQ
    paths; the flat relation here isolates the truncation effect from
    index approximation."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(floor(x * 4096) AS BIGINT))"
        ).alias("qv"),
    )
    qs = v.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qq")
    )
    pairs = (
        F.broadcast(qs)
        .join(v, F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qq",
            F.col("vec_id").alias("cid"),
            F.col("qv").alias("cv"),
        )
    )

    def topk(dot_expr: str) -> DataFrame:
        from pyspark.sql import Window

        scored = pairs.withColumn("score", F.expr(dot_expr))
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col("cid"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= _K)
            .select("qid", "cid")
        )

    full_dot = (
        "aggregate(zip_with(qq, cv, (x, y) -> x * y), "
        "CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    gt = topk(full_dot).localCheckpoint()  # referenced by every depth
    outs = []
    for d in _MAT_DIMS:
        dot_d = (
            f"aggregate(zip_with(slice(qq, 1, {d}), slice(cv, 1, {d}), "
            f"(x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        hits = topk(dot_d).join(gt, ["qid", "cid"]).agg(
            F.count(F.lit(1)).cast("bigint").alias("recall_hits")
        )
        outs.append(
            hits.select(
                F.lit(d).cast("int").alias("trunc_dim"),
                "recall_hits",
                F.lit(_N_QUERIES * _K).cast("bigint").alias("n_possible"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


@query(
    "simsearch_ivf_incremental_assign",
    tags=("simsearch", "ann", "incremental", "llm-pipeline", "scale-path"),
    oracle=f"""
    WITH {_DUCK_V_CTE},
    cent AS (SELECT vec_id AS cent_id, ve AS cv FROM v WHERE vec_id < 16),
    {_duck_assigned_cte("cent")}
    SELECT centroid_id,
           CAST(SUM(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS base_count,
           CAST(SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS delta_count,
           CAST(COUNT(*) AS BIGINT) AS new_total
    FROM assigned GROUP BY centroid_id
    """,
)
def simsearch_ivf_incremental_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-snapshot INCREMENTAL ANN indexing — the third leg of the
    repo's incremental-state trio (exact lines: line_ledger; fuzzy
    text: minhash_band_index; vectors: THIS): a recurring embedding
    ingest keeps the coarse quantizer FIXED (the 16 stored seed
    centroids — retraining would invalidate every stored posting) and
    per-cell posting counts as state; each new slice is assigned
    against the stored centroids only, and the stored counts advance
    by the per-cell delta.  Fixture split: base = vec_id % 10 != 0,
    delta = the rest; output per cell: stored count, delta count, and
    the advanced total.  Assignment ties break to the lower centroid
    id (the repo-wide IVF convention), so the result is value-exact.

    Scale shape: the centroid table is a broadcast (K vectors); each
    slice's assignment is ONE narrow broadcast-join pass over that
    slice only — the base corpus is never re-read (its counts are the
    stored state); the merge is a full outer join at CELL granularity
    (K rows).  Two-batch equivalence (stored state materialized
    bucketed, stored + delta == from-scratch) is pinned in
    tests/test_operators.py."""
    from parquet_to_sql_spark.operators.simsearch import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    bc = (
        ivf_assign(base, "vec_id", "embedding", cent)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("base_count"))
    )
    dc = (
        ivf_assign(delta, "vec_id", "embedding", cent)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("delta_count"))
    )
    return (
        bc.join(dc, "centroid_id", "full_outer")
        .select(
            "centroid_id",
            F.coalesce("base_count", F.lit(0)).cast("bigint").alias(
                "base_count"
            ),
            F.coalesce("delta_count", F.lit(0)).cast("bigint").alias(
                "delta_count"
            ),
            (
                F.coalesce("base_count", F.lit(0))
                + F.coalesce("delta_count", F.lit(0))
            ).cast("bigint").alias("new_total"),
        )
    )

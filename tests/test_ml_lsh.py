"""pyspark.ml LSH integration (SURVEY §2.C names these as the stock
Spark mapping): MinHashLSH over token shingles and
BucketedRandomProjectionLSH over embeddings. The engine's primary
implementations are the custom exact-oracle operators in
operators/dedup.py / operators/simsearch.py; these tests pin that the
stock ML path ALSO works here and broadly agrees with the exact
operators — the approxSimilarityJoin/approxNearestNeighbors shapes a
user might bring from vanilla Spark."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parquet_to_sql_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def test_ml_minhash_lsh_candidates_overlap_exact_jaccard(spark):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, Tokenizer

    from parquet_to_sql_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    toks = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    grams = NGram(n=3, inputCol="words", outputCol="shingles").transform(toks)
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True, minDF=1.0
    ).fit(grams)
    feat = cv.transform(grams).filter(
        # MinHashLSH requires at least one non-zero entry
        F.udf(lambda v: v.numNonzeros() > 0, "boolean")("features")
    )
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feat)
    sims = (
        model.approxSimilarityJoin(feat, feat, 0.6, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc1"),
            F.col("datasetB.doc_id").alias("doc2"),
            "jaccard_dist",
        )
        .collect()
    )
    ml_pairs = {(r.doc1, r.doc2) for r in sims}

    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=None
    ).collect()
    exact_pairs = {(r.doc1, r.doc2) for r in exact}
    # every exact near-dup pair (jaccard >= 0.5 <=> dist <= 0.5) must be
    # recalled by the ML LSH join at the looser 0.6 distance threshold
    assert exact_pairs <= ml_pairs
    spark.catalog.clearCache()


def test_ml_brp_lsh_approx_nearest_neighbors(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors, VectorUDT

    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    to_vec = F.udf(lambda a: Vectors.dense(a), VectorUDT())
    feat = emb.select("vec_id", to_vec("embedding").alias("features")).cache()

    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=2.0, numHashTables=6, seed=7,
    )
    model = brp.fit(feat)

    query = feat.filter(F.col("vec_id") == 0).collect()[0].features
    ann = model.approxNearestNeighbors(
        feat.filter(F.col("vec_id") != 0), query, 5, distCol="dist"
    ).collect()
    assert len(ann) == 5

    # brute-force euclidean for ground truth
    brute = sorted(
        (float(r.features.squared_distance(query)) ** 0.5, r.vec_id)
        for r in feat.filter(F.col("vec_id") != 0).collect()
    )
    true_min = brute[0][0]
    got_min = min(r.dist for r in ann)
    # ANN's best must be within 25% of the true nearest distance
    assert got_min <= true_min * 1.25, (got_min, true_min)
    feat.unpersist()

"""Composed training-data-pipeline queries — the building blocks
(quality scoring, exact dedup, tokenization, deterministic sampling)
chained the way a real corpus-preparation job chains them, all inside
one oracle-checked plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.functions.hashing import char_fold_hash
from parquet_to_sql_spark.queries.registry import query
from parquet_to_sql_spark.queries.text import DUCK_FOLD, DUCK_WORDS, _DUCK_QUALITY


@query(
    "sample_stratified_hash",
    tags=("sampling", "llm-pipeline"),
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {DUCK_FOLD.format(s="CAST(doc_id AS VARCHAR)")} % 10
          < (CASE WHEN lang = 'en' THEN 2 ELSE 5 END)
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~20% of English docs and
    ~50% of everything else, selected by a content-independent hash of
    the id — reproducible on any engine (unlike Bernoulli sampleBy,
    whose RNG stream is engine-specific), stable under reruns and
    repartitioning, and executed as a pure pushdown-friendly filter."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(2)).otherwise(F.lit(5))
    return docs.filter(
        char_fold_hash(F.col("doc_id").cast("string")) % F.lit(10) < rate
    ).select("doc_id", "lang", "source")


@query(
    "pipeline_corpus_clean",
    tags=("pipeline", "dedup", "text-analysis", "llm-pipeline"),
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text, lang, {_DUCK_QUALITY} AS quality
      FROM documents
    ), kept AS (
      SELECT * FROM scored WHERE quality >= 0.5
    ), keep_ids AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY sha256(text)
    ), deduped AS (
      SELECT k.* FROM kept k JOIN keep_ids USING (doc_id)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(len({DUCK_WORDS}) AS BIGINT)) AS BIGINT) AS total_ws_tokens,
           MIN(quality) AS min_quality,
           MAX(quality) AS max_quality
    FROM deduped
    GROUP BY lang
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus-prep chain in ONE plan: quality-score ->
    threshold filter -> exact dedup (sha256 groupBy, keep min id) ->
    per-language stats. Composition stays fully declarative, so
    Catalyst pipelines the filter into the scan and the dedup is the
    same single-shuffle hash-groupBy as dedup_exact_sha256. Quality
    aggregates are MIN/MAX (order-independent — double SUMs of
    computed expressions would not be cross-engine stable)."""
    from parquet_to_sql_spark.operators.text import quality_score, ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text", "lang", quality_score(F.col("text")).alias("quality")
    )
    kept = scored.filter(F.col("quality") >= 0.5)
    keep_ids = kept.groupBy(F.sha2(F.col("text").cast("binary"), 256)).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    deduped = kept.join(keep_ids, "doc_id")
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(ws_tokens(F.col("text"))).cast("bigint")).alias(
            "total_ws_tokens"
        ),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )

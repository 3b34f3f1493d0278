"""Multimodal-column queries: binary payload plumbing over `documents`
(text bytes stand in for image payloads — the container has no real
decoders, by design).

The metadata path (n_bytes, sha256) is fully oracle-checked; the
mapInPandas decode path is a custom Python-batch operator, i.e.
genuinely non-SQL-expressible, so it carries no oracle (rows-only
check) — its values are pinned by unit tests instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.catalog import load_table
from parquet_to_sql_spark.operators.multimodal import decode_image_features, pack_binary
from parquet_to_sql_spark.queries.registry import query


def _packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_binary(
        docs,
        data=F.encode(F.col("text"), "utf-8"),
        uri=F.concat(F.lit("doc://"), F.col("doc_id").cast("string")),
        media_type="text/plain",
    )


@query(
    "multimodal_pack_metadata",
    tags=("multimodal", "llm-pipeline"),
    oracle="""
    SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS uri,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents
    """,
)
def multimodal_pack_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset struct metadata: uri, media type, byte length,
    content hash — the typed-metadata half of the multimodal column
    convention, all JVM-side."""
    packed = _packed_docs(spark, sf_dir)
    return packed.select(
        F.col("asset.uri").alias("uri"),
        F.col("asset.media_type").alias("media_type"),
        F.col("asset.meta.n_bytes").alias("n_bytes"),
        F.col("asset.meta.sha256").alias("payload_sha256"),
    )


@query(
    "multimodal_decode_features",
    tags=("multimodal", "mapInPandas", "llm-pipeline"),
    oracle=None,  # custom Arrow-batched Python operator (mapInPandas)
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (deterministic fake decoder; real decoder is the same plumbing
    with PIL/libvips on executors)."""
    packed = _packed_docs(spark, sf_dir)
    return decode_image_features(packed, fake=True)

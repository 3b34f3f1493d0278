"""LLM-data-pipeline operators: text analysis, deduplication,
similarity search, multimodal column handling.

These extend the reference's surface (it has none of this — SURVEY.md
§2.C) with the operations a large-scale training-data pipeline needs,
each designed around Spark's execution model: explode/groupBy instead
of pairwise loops, banding joins instead of O(n²) candidate
generation, broadcast for small query sets.
"""

from parquet_to_sql_spark.operators import dedup, simsearch, text, multimodal  # noqa: F401

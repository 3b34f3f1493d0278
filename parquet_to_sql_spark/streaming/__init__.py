from parquet_to_sql_spark.streaming.pipeline import (
    contamination_screen_stream,
    dedup_within_watermark,
    documents_stream,
    events_stream,
    neardup_screen_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_import,
    tumbling_counts,
    user_running_totals,
    user_value_ewma,
)

__all__ = [
    "contamination_screen_stream",
    "events_stream",
    "documents_stream",
    "neardup_screen_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "user_running_totals",
    "user_value_ewma",
    "run_to_memory",
    "stream_import",
]

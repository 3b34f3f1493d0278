from parquet_to_sql_spark.functions.hashing import (
    FOLD_MOD,
    char_fold_hash,
    minhash_constants,
    positional_shingles,
    word_shingles,
)

__all__ = [
    "FOLD_MOD",
    "char_fold_hash",
    "minhash_constants",
    "positional_shingles",
    "word_shingles",
]

"""Value-exactness of the vectorized Arrow hash kernels
(operators/hashkernel.py) against the JVM higher-order-function
formulations they replace — row-by-row equality INCLUDING array order,
over the full sf0.1 documents corpus and adversarial edge strings
(empties, tab/newline whitespace, non-\\s unicode spaces, surrogate
pairs, NULLs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parquet_to_sql_spark.functions.hashing import (
    char_fold_hash,
    positional_shingles,
    shingle_hashes_from,
    word_hashes,
)
from parquet_to_sql_spark.operators.hashkernel import (
    hashedfold_kgram_hashes,
    simhash_arrow,
    stringfold_kgram_hashes,
    word_hash_arrays,
)
from parquet_to_sql_spark.operators.text import ws_tokens

EDGES = [
    "", " ", "  ", "a", " a", "a ", "\ta", "a\t", "a  b", "a\tb\nc",
    "x \t\n y", "a\xa0b", "a b", "a\U0001d11eb", "aéb",
    "one two three four five", "w " * 50, None,
]


def _edge_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(EDGES)], "doc_id long, text string"
    )


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )


def _assert_same(got, want, keys=("doc_id",)):
    g = {tuple(r[k] for k in keys): r for r in got.collect()}
    w = {tuple(r[k] for k in keys): r for r in want.collect()}
    assert set(g) == set(w)
    for k in g:
        assert g[k].asDict() == w[k].asDict(), f"mismatch at {k}"


@pytest.mark.parametrize("source", ["edges", "corpus"])
def test_word_hash_arrays_exact(spark, source):
    df = _edge_df(spark) if source == "edges" else _docs(spark)
    want = df.select(
        "doc_id", word_hashes(ws_tokens(F.col("text"))).alias("hw")
    )
    _assert_same(word_hash_arrays(df, "doc_id", "text"), want)


@pytest.mark.parametrize("source", ["edges", "corpus"])
@pytest.mark.parametrize("n", [2, 3])
def test_stringfold_kgrams_exact(spark, source, n):
    df = _edge_df(spark) if source == "edges" else _docs(spark)
    want = df.select(
        "doc_id",
        F.transform(
            positional_shingles(ws_tokens(F.col("text")), n), char_fold_hash
        ).alias("shs"),
    )
    _assert_same(stringfold_kgram_hashes(df, "doc_id", "text", n), want)


@pytest.mark.parametrize("source", ["edges", "corpus"])
@pytest.mark.parametrize("n", [3, 5])
def test_hashedfold_kgrams_exact(spark, source, n):
    df = _edge_df(spark) if source == "edges" else _docs(spark)
    want = df.select(
        "doc_id",
        F.col("text"),
    ).select(
        "doc_id",
        shingle_hashes_from(
            word_hashes(ws_tokens(F.col("text"))), n
        ).alias("shs"),
    )
    _assert_same(hashedfold_kgram_hashes(df, "doc_id", "text", n), want)


@pytest.mark.parametrize("source", ["edges", "corpus"])
@pytest.mark.parametrize("bits", [16, 24])
def test_simhash_exact(spark, source, bits):
    from parquet_to_sql_spark.operators.text import simhash_sketch

    df = _edge_df(spark) if source == "edges" else _docs(spark)
    _assert_same(
        simhash_arrow(df, "doc_id", "text", bits=bits),
        simhash_sketch(df, "doc_id", "text", bits=bits),
    )

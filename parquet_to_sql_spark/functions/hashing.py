"""Deterministic, cross-engine string hashing as Column expressions.

Native hash functions differ between engines (Spark's hash() is
Murmur3; DuckDB's is its own), so every hashed operator here (minhash,
simhash, fingerprints) is built on one primitive both can evaluate
identically: a 31-ary polynomial fold over Unicode codepoints, mod the
Mersenne prime 2^31-1.

    h(s) = fold(chars(s), 0, (acc, c) -> (acc*31 + codepoint(c)) mod (2^31-1))

Bounds: acc < 2^31, so acc*31 + c < 2^36 — no BIGINT overflow. The
whole thing stays in whole-stage codegen (transform/aggregate are
JVM higher-order functions, not UDFs), and the identical formula is
expressible in the DuckDB oracle via list_transform/list_reduce.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

FOLD_MOD = 2_147_483_647  # 2^31 - 1


def char_fold_hash(col: Column) -> Column:
    """Polynomial codepoint fold of a string -> long in [0, 2^31-1)."""
    chars = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(FOLD_MOD),
    )


def word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a words array (for minhash/Jaccard).

    words[i-1..i+n-2] joined by spaces, i in 1..len-n+1; documents
    shorter than n words produce an empty set.
    """
    # sequence(1, 0) would count DOWN in Spark, so guard short docs
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + off).cast("int")) for off in range(n)]
        ),
    )
    return F.array_distinct(joined)


def minhash_constants(k: int = 8) -> list[tuple[int, int]]:
    """Fixed (a, b) pairs for the k permutation hashes
    h_i(x) = (a_i*x + b_i) mod (2^31-1). a_i*x < 2^36 — overflow-safe."""
    a = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67]
    b = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59]
    if k > len(a):
        raise ValueError(f"k <= {len(a)} supported")
    return list(zip(a[:k], b[:k]))

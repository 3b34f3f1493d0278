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


def positional_shingles(words: Column, n: int = 3) -> Column:
    """n-word shingles of a words array, POSITIONAL (non-distinct, in
    document order): words[i-1..i+n-2] joined by spaces, i in
    1..len-n+1; documents shorter than n words produce an empty array.
    The shared windowed-join core of the shingle family — winnowing
    consumes this sequence directly (it needs every position);
    word_shingles adds the distinct for set-semantics consumers."""
    # sequence(1, 0) would count DOWN in Spark, so guard short docs
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + off).cast("int")) for off in range(n)]
        ),
    )


def word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a words array (for minhash/Jaccard);
    set semantics over the positional_shingles core."""
    return F.array_distinct(positional_shingles(words, n))


def word_hashes(words: Column) -> Column:
    """Codepoint-fold hash of every word in a words array.  STAGE THIS
    AS A REAL COLUMN (``.select(... .alias("hw"))``) before feeding it
    to shingle_hashes_from: a Column expression referenced k times is
    inlined (and recomputed) k times by codegen — only a named
    intermediate column guarantees one evaluation per row."""
    return F.transform(words, char_fold_hash)


def shingle_hashes_from(hw: Column, n: int = 3) -> Column:
    """Positional n-word shingle HASHES from a staged word-hash array:
    combine the n word-hashes of each window with the same 31-ary fold
    (``h = (h*31 + hw_i) mod (2^31-1)``, h0 = 0).

    Versus ``char_fold_hash(concat_ws(' ', w1..wn))`` this does the
    per-character work ONCE per word instead of once per shingle
    occurrence (each word sits in up to n shingles) and allocates no
    shingle strings — ~3x less map CPU at n=3, the dominant cost of
    the hashed-shingle dedup family.  Values differ from the
    string-fold variant (no space chars in the fold), which is fine:
    the measure is "similarity over hashed shingles" and both engines
    use this same composition.  acc < 2^31 and hw_i < 2^31, so
    acc*31 + hw_i < 2^36 — overflow-safe in BIGINT.
    """
    idx = F.when(
        F.size(hw) >= n, F.sequence(F.lit(1), F.size(hw) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))

    def combine(i: Column) -> Column:
        acc = F.element_at(hw, i.cast("int"))
        for off in range(1, n):
            acc = (acc * F.lit(31) + F.element_at(hw, (i + off).cast("int"))) % F.lit(
                FOLD_MOD
            )
        return acc

    return F.transform(idx, combine)


DUCK_WORD_HASHES = (
    "list_transform({words}, w -> "
    "list_reduce(list_transform(string_split(w, ''), "
    "c -> CAST(ascii(c) AS BIGINT)), (acc, x) -> (acc*31 + x) % 2147483647))"
)


def duck_hashed_kgram_acc(n: int = 3) -> str:
    """The 31-ary window fold over a staged word-hash array ``hw`` at
    1-based window start ``i`` — the shared core of the DuckDB-side
    hashed k-gram mirrors (identical combination as
    shingle_hashes_from)."""
    acc = "hw[i]"
    for off in range(1, n):
        acc = f"((({acc}) * 31 + hw[i+{off}]) % 2147483647)"
    return acc


def duck_hashed_word_shingles(n: int = 3) -> str:
    """The DuckDB mirror of hashed_word_shingles as an expression over
    a staged word-hash array column named ``hw`` (stage it with
    ``DUCK_WORD_HASHES.format(words=...) AS hw`` in a subquery) —
    identical window combination as the Spark side."""
    return (
        f"list_transform(range(1, len(hw) - {n - 2}), "
        f"i -> {duck_hashed_kgram_acc(n)})"
    )


def duck_hashed_positional_kgrams(n: int) -> str:
    """DuckDB mirror of hashed_positional_kgrams: a list of
    {'pos', 'h'} structs over the staged ``hw`` array (1-based pos),
    ready to unnest."""
    return (
        f"list_transform(range(1, len(hw) - {n - 2}), "
        f"i -> {{'pos': i, 'h': {duck_hashed_kgram_acc(n)}}})"
    )


def _first_primes(n: int, start_after: int = 1) -> list[int]:
    """First ``n`` primes strictly greater than ``start_after`` —
    deterministic trial division (n is at most a few hundred here)."""
    out: list[int] = []
    cand = max(start_after + 1, 2)
    while len(out) < n:
        if cand >= 2 and all(cand % p for p in range(2, int(cand**0.5) + 1)):
            out.append(cand)
        cand += 1
    return out


def minhash_constants(k: int = 8) -> list[tuple[int, int]]:
    """Fixed (a, b) pairs for the k permutation hashes
    h_i(x) = (a_i*x + b_i) mod (2^31-1): a_i = consecutive primes
    from 7, b_i = consecutive primes from 3 — for k <= 16 these are
    byte-identical to the original hand-written lists (every recorded
    oracle embeds them), and the prime generator extends the same
    sequence to production parameters (k=128 for the RefinedWeb/Dolma
    banding audit).  Overflow-safe: even at k=512 a_i < 4000, so
    a_i*x < 4000 * 2^31 < 2^43 in BIGINT on both engines."""
    if k > 512:
        raise ValueError(f"k <= 512 supported, got {k}")
    a = _first_primes(k, start_after=6)
    b = _first_primes(k, start_after=2)
    return list(zip(a, b))


def countmin_cells(hx: Column, depth: int = 4, width: int = 1024) -> Column:
    """The Count-Min sketch update set for one hashed item: an array
    of (i, bucket) structs, one per sketch row, with
    bucket_i = ((a_i*hx + b_i) mod (2^31-1)) mod width over the
    minhash (a, b) pair family.  Row-local; shared by the batch
    agg_countmin_words query and the streaming countmin_stream twin
    so both maintain the IDENTICAL sketch."""
    pairs = minhash_constants(depth)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (
                    ((F.lit(a) * hx + F.lit(b)) % F.lit(FOLD_MOD))
                    % F.lit(width)
                ).alias("bucket"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )

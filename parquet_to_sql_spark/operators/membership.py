"""Bloom-filter membership screening — the constant-space prefilter
for corpus-scale "is this key in the reference set?" questions.

The production problem: screening arriving/candidate rows against a
reference key set (benchmark contamination IDs, already-ingested doc
hashes, a blocklist) whose exact materialization is too large to
broadcast as a join side.  A Bloom filter compresses the set to a
fixed bit array with NO false negatives and a tunable false-positive
rate, so the screen becomes: small broadcast + row-local probe, with
an exact verify (semi-join) only over the ~fpp-sized survivor stream.

Build is Spark-native: the JVM ``Dataset.stat.bloomFilter`` (public
Scala API since 2.0; PySpark classic exposes no wrapper, so we call
through ``_jdf``) aggregates the filter JVM-side and tree-merges
partials — one pass, merged bytes O(numBits) not O(rows).  Spark 4
does not expose ``bloom_filter_agg``/``might_contain`` as SQL
routines either (version watch: if a future Spark ships
``might_contain`` as a SQL routine, the whole numpy probe below can
be deleted in favor of one Column expression — re-check per
upgrade), so the probe is an Arrow-batched mapInPandas over a
``SparkContext.broadcast`` of the serialized bit array (shipped once
per executor, NOT pickled into every task closure — at ~1.2
bytes/item a 1e9-key filter is ~1.2 GB, which must ride the
broadcast machinery), reimplementing the V2
``mightContainLong`` bit-exactly in vectorized numpy — two
Murmur3_x86_32 long-hashes (hi = hash(item, seed), lo = hash(item,
hi)), the V2 accumulator schedule (acc = hi * 2^31-1; acc += lo per
probe; bit-flip when negative; mod bitSize), all whole-array
int64/uint32 ops, no per-row Python.  The reimplementation is pinned
against the JVM filter's own ``mightContainLong`` in tests, so a
future algorithm change fails loudly instead of silently diverging.

Keys of any type are first normalized JVM-side to a stable 64-bit
hash (xxhash64 Column expression), so the filter itself only ever
holds longs — the same key prep on build and probe sides.

Scale shape: build = one reference pass; probe = broadcast bytes
(~1.2 bytes/item at fpp 2%) + row-local batch math; verify = a
semi-join whose probe side is already down to matches + false
positives.  At 100 TB the exact semi-join alone would shuffle the
full probe stream; with the prefilter only survivors shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_V2 = 2  # BloomFilterImplV2 serialization (Spark 4): the only format
# this probe implements — the version check below fails loudly on V1
# or any future V3.


def bloom_build(
    reference: DataFrame, key_col: str, expected_items: int, fpp: float = 0.02
) -> tuple[bytes, int, int, int]:
    """Build a Bloom filter of ``reference``'s keys (nulls excluded;
    keys normalized to xxhash64 longs).  Returns (filter_bytes,
    num_hash_functions, seed, bit_size) — plain Python values, safe
    to close over in any number of probe tasks.

    filter_bytes layout (BloomFilterImplV2.writeTo): int32 version,
    int32 numHashFunctions, int32 seed, int32 numWords, then numWords
    big-endian int64 bit words."""
    if expected_items < 1:
        raise ValueError("expected_items must be >= 1")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    hashed = reference.filter(F.col(key_col).isNotNull()).select(
        F.xxhash64(F.col(key_col)).alias("_h")
    )
    jfilter = hashed._jdf.stat().bloomFilter("_h", expected_items, float(fpp))
    bos = hashed.sparkSession._jvm.java.io.ByteArrayOutputStream()
    jfilter.writeTo(bos)
    raw = bytes(bos.toByteArray())
    version, k, seed, n_words = struct.unpack(">iiii", raw[:16])
    if version != _V2:
        raise RuntimeError(
            f"BloomFilter serialization version {version} != {_V2}; "
            "the numpy probe implements V2 only — update it in lockstep"
        )
    return raw, k, seed, n_words * 64


def _mmh3_hash_long(vals, seed):
    """Vectorized Murmur3_x86_32 of int64 values (Spark's
    Murmur3_x86_32.hashLong): the two 32-bit halves mixed low-first,
    total length 8, fmix32 finalizer.  ``vals`` is np.uint64;
    ``seed`` is a scalar or per-element np.uint32; returns np.int32."""
    import numpy as np

    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    h1 = (np.zeros(vals.shape, dtype=np.uint32) + np.asarray(seed, dtype=np.uint32))
    low = vals.astype(np.uint32)
    high = (vals >> np.uint64(32)).astype(np.uint32)
    with np.errstate(over="ignore"):
        for k in (low, high):
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h1 = h1 ^ k
            h1 = (h1 << np.uint32(13)) | (h1 >> np.uint32(19))
            h1 = h1 * np.uint32(5) + np.uint32(0xE6546B64)
        h1 = h1 ^ np.uint32(8)  # total byte length of a long
        # fmix32
        h1 = h1 ^ (h1 >> np.uint32(16))
        h1 = h1 * np.uint32(0x85EBCA6B)
        h1 = h1 ^ (h1 >> np.uint32(13))
        h1 = h1 * np.uint32(0xC2B2AE35)
        h1 = h1 ^ (h1 >> np.uint32(16))
    return h1.astype(np.int32)


def might_contain_longs(vals, filter_bytes: bytes, k: int, seed: int, bit_size: int):
    """Vectorized BloomFilterImplV2.mightContainLong over an int64
    numpy array: hi = mmh3(item, seed), lo = mmh3(item, hi);
    acc = hi * (2^31 - 1); per probe i: acc += lo, index = ~acc when
    negative else acc, bit test at index % bit_size.  Signed-int64
    accumulator cannot overflow (|acc| <= 2^31 * (2^31-1) + k*2^31)."""
    import numpy as np

    words = np.frombuffer(filter_bytes, dtype=">i8", offset=16).astype(np.int64)
    v = vals.astype(np.uint64)
    hi = _mmh3_hash_long(v, np.uint32(seed))
    lo = _mmh3_hash_long(v, hi.view(np.uint32))
    acc = hi.astype(np.int64) * np.int64(2147483647)
    lo64 = lo.astype(np.int64)
    out = np.ones(v.shape, dtype=bool)
    for _ in range(k):
        acc = acc + lo64
        idx = np.where(acc < 0, ~acc, acc)
        pos = idx % np.int64(bit_size)
        bit = (words[pos >> 6] >> (pos & np.int64(63))) & np.int64(1)
        out &= bit.astype(bool)
    return out


def bloom_probe(
    df: DataFrame, key_col: str, bloom: tuple[bytes, int, int, int]
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the filtered set: every
    true member survives (no false negatives), plus ~fpp false
    positives.  The key is hashed JVM-side (same xxhash64 as the
    build); the probe is one Arrow-batched mapInPandas doing
    whole-array bit math against the filter bytes, which ride a
    session-shared ``SparkContext.broadcast`` (content-addressed via
    ``broadcast_cache.shared_broadcast``: repeated probes of the same
    filter reuse ONE broadcast, and stale ones are LRU-unpersisted so
    a long-lived session cannot accumulate dead filter bytes — ADVICE
    r05) so they are shipped once per executor instead of being
    pickled into every task's closure (the closure captures only the
    Broadcast handle + three ints — pinned by
    ``tests/test_scale_features.py``).  Stateless, so it is legal on
    a streaming DataFrame too (broadcast variables are readable from
    streaming tasks).  NULL keys never match (filtered before the
    probe), mirroring semi-join null semantics."""
    from parquet_to_sql_spark.operators.broadcast_cache import (
        payload_digest,
        shared_broadcast,
    )

    filter_bytes, k, seed, bit_size = bloom
    bc = shared_broadcast(
        df.sparkSession,
        payload_digest(b"bloom_probe", filter_bytes),
        lambda: filter_bytes,
    )
    staged = df.filter(F.col(key_col).isNotNull()).withColumn(
        "_probe_h", F.xxhash64(F.col(key_col))
    )
    schema = staged.schema

    def probe(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf):
                mask = might_contain_longs(
                    pdf["_probe_h"].to_numpy(), bc.value, k, seed, bit_size
                )
                pdf = pdf[mask]
            yield pdf

    return staged.mapInPandas(probe, schema).drop("_probe_h")


def bloom_screen_exact(
    df: DataFrame,
    key_col: str,
    reference: DataFrame,
    ref_key_col: str,
    expected_items: int,
    fpp: float = 0.02,
) -> DataFrame:
    """Exact membership screen with a Bloom prefilter: probe survivors
    (matches + false positives) are verified by a semi-join against
    the true reference keys, so the result is EXACTLY the rows of
    ``df`` whose key appears in ``reference`` — same answer as a plain
    semi-join, but only the prefiltered fraction of ``df`` reaches the
    shuffle.  The composition every at-scale blocklist / contamination
    / already-seen screen wants."""
    bloom = bloom_build(
        reference.select(F.col(ref_key_col).alias(key_col)),
        key_col,
        expected_items,
        fpp,
    )
    candidates = bloom_probe(df, key_col, bloom)
    return candidates.join(
        reference.select(F.col(ref_key_col).alias(key_col)).distinct(),
        key_col,
        "left_semi",
    )

"""Relational helper operators: skew-resistant joins.

AQE's skew-join splitting handles most hot keys automatically; this
explicit salted join is for the cases AQE can't fix (a single key too
hot for any split, or a deliberately pre-partitioned pipeline). The
salt is DETERMINISTIC — derived from a high-cardinality column on the
big side — so results are reproducible run to run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side on `key`, spreading each
    hot key over `buckets` reducers.

    big rows get salt = pmod(hash-ish of `salt_from`, buckets); the
    small side is replicated once per salt value (rows x buckets — keep
    the small side genuinely small). The join key becomes (key, salt),
    so one hot key's rows land on `buckets` different reducers instead
    of one. Semantically identical to big.join(small, key, how).
    """
    salted_big = big.withColumn("_salt", F.pmod(F.col(salt_from), F.lit(buckets)))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias("_salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")

"""Salted join: the manual skew defusal for joins whose hot keys defeat
a plain hash-partitioned join.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default in
session.py) splits oversized sort-merge partitions at runtime and is
the first line of defense; it cannot help when the build side must be
shuffled too (no broadcast) AND a single key's rows exceed what one
split can hold, or when AQE is unavailable (streaming micro-batches).
The classic manual fix: replicate the small side SALT_N times and
scatter the big side's rows uniformly across the salt space, so a hot
key's rows land on SALT_N partitions instead of one.

Cost model (what to tell a 10^12-row user): the small side's shuffle
volume multiplies by ``salt_n``; the big side's volume is unchanged
(one extra int in the key). Pick salt_n ≈ (hot-key row count) /
(target rows per task). Correctness is invariant to salt_n because
every (big row, small row) key match meets at exactly one salt value —
the big row's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` ⋈ ``small`` on ``on`` with the big side's hot
    keys scattered over ``salt_n`` sub-keys. ``how`` supports the
    left-family joins (inner/left/left_outer); right/full would need
    the replication on the other side."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how}")
    if salt_n < 1:
        raise ValueError("salt_n must be >= 1")
    # deterministic scatter: hash of the whole row spreads rows of one
    # key uniformly without an RNG (rand() breaks retry idempotency —
    # a re-computed task must land rows on the same salt)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")

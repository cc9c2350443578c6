"""salted_join ≡ plain join at any salt_n, including hot keys, left
nulls, and duplicate small-side rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # key 7 is hot (5k rows); keys 1-5 normal; key 99 has no match
    big = spark.createDataFrame(
        [(7 if i % 2 == 0 else (i % 5) + 1, i) for i in range(10_000)] + [(99, -1)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (7, "hot"), (7, "hot2")],
        "k long, name string",
    )
    return big, small


@pytest.mark.parametrize("salt_n", [1, 4, 32])
def test_inner_matches_plain(spark, frames, salt_n):
    big, small = frames
    plain = sorted(tuple(r) for r in big.join(small, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(big, small, "k", salt_n=salt_n).collect())
    assert salted == plain


def test_left_keeps_unmatched(spark, frames):
    big, small = frames
    plain = sorted(tuple(r) for r in big.join(small, "k", "left").collect())
    salted = sorted(tuple(r) for r in salted_join(big, small, "k", salt_n=8, how="left").collect())
    assert salted == plain
    assert any(r[0] == 99 and r[2] is None for r in salted)


def test_hot_key_spreads_across_salts(spark, frames):
    big, _small = frames
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    )
    n_salts = big_s.filter(F.col("k") == 7).select("_salt").distinct().count()
    assert n_salts == 16  # 5k hot rows hit every sub-key


def test_rejects_right_join(spark, frames):
    big, small = frames
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="right")

"""oracle_xxh must agree with Spark's xxhash64 bit-for-bit — it anchors
every fixture oracle (MinHash banding, SimHash, winnowing)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.oracle_xxh import xxh64_signed


def _spark_hashes(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}


def test_xxh64_matches_spark_edge_lengths(spark):
    # every tail-handling branch: <4, 4-7, 8-31, 32+, multiples, utf-8
    values = ["", "a", "ab", "abc", "abcd", "x" * 7, "y" * 8, "q" * 15, "z" * 31,
              "w" * 32, "v" * 33, "long " * 40, "é·ü漢字", "Document 42", "0"]
    got = _spark_hashes(spark, values)
    for v in values:
        assert xxh64_signed(v) == got[v], repr(v)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=70), min_size=1, max_size=8, unique=True))
def test_xxh64_matches_spark_fuzz(spark, strings):
    got = _spark_hashes(spark, strings)
    for s in strings:
        assert xxh64_signed(s) == got[s], repr(s)

"""mix_sources: mixture-rate math, budget monotonicity, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.sampling import mix_sources

WEIGHTS = {"a": 0.5, "b": 0.3, "c": 0.2}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(4000):
        src = ["a", "b", "c", "other"][i % 4]  # 1000 docs per source
        rows.append((i, src))
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates(spark, corpus):
    out = mix_sources(corpus, F.col("doc_id"), F.col("source"), WEIGHTS, budget=1000)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "other" not in counts  # unlisted sources dropped
    # Bernoulli keep-rates 0.5/0.3/0.2 over 1000 docs each: ±5 sigma bounds
    assert 420 <= counts["a"] <= 580
    assert 230 <= counts["b"] <= 370
    assert 140 <= counts["c"] <= 260


def test_budget_monotone_and_deterministic(spark, corpus):
    small = {r["doc_id"] for r in mix_sources(corpus, F.col("doc_id"), F.col("source"), WEIGHTS, budget=500).collect()}
    large = {r["doc_id"] for r in mix_sources(corpus, F.col("doc_id"), F.col("source"), WEIGHTS, budget=1500).collect()}
    assert small <= large  # growing the budget only adds documents
    again = {r["doc_id"] for r in mix_sources(corpus.repartition(17), F.col("doc_id"), F.col("source"), WEIGHTS, budget=500).collect()}
    assert again == small  # partitioning-invariant


def test_default_budget_is_scarcest_source_bound(spark, corpus):
    # without a budget: bound = min(n_s / w_s) = 1000 / 0.5 = 2000 →
    # source 'a' keeps everything (rate 1.0)
    out = mix_sources(corpus, F.col("doc_id"), F.col("source"), WEIGHTS)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 1000


def test_missing_source_raises(spark, corpus):
    with pytest.raises(ValueError, match="absent"):
        mix_sources(corpus, F.col("doc_id"), F.col("source"), {"a": 0.5, "nope": 0.5})

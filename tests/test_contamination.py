"""contamination_hits: the guaranteed-detection length bound, clean-doc
zeros, and the asymmetric-enumeration semantics."""

from __future__ import annotations

import pytest

from insurance_pdf_extractor_spark.operators.dedup import contamination_hits

W, S = 20, 10  # window, train stride → guaranteed above 20 + 10 - 1 = 29 chars


def _hits(spark, train_rows, bench_rows):
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    bench = spark.createDataFrame([(t,) for t in bench_rows], "text string")
    out = contamination_hits(train, bench, window=W, train_stride=S)
    return {r["doc_id"]: (r["n_hits"], r["first_hit_pos"]) for r in out.collect()}


def test_planted_overlap_detected(spark):
    secret = "the quick brown fox jumps over the lazy dog"  # 43 chars > 29
    train = [
        (1, "x" * 30 + secret + "y" * 30),   # contains the benchmark string
        (2, "clean document with no shared substrings at all " * 3),
    ]
    got = _hits(spark, train, [secret])
    assert got[1][0] > 0
    assert got[2] == (0, -1)


def test_guarantee_threshold(spark):
    """A shared region of exactly window+stride-1 chars is detected at
    EVERY grid phase; a region of window-1 chars never is."""
    region = "abcdefghijklmnopqrstuvwxyz012" + "!"  # 30 >= 29 chars
    assert len(region) >= W + S - 1
    for phase in range(S):
        doc = "z" * (31 + phase) + region + "z" * 40
        got = _hits(spark, [(1, doc)], [region])
        assert got[1][0] > 0, f"missed at phase {phase}"
    short = "0123456789abcdefghi"  # 19 < window
    got = _hits(spark, [(1, "z" * 35 + short + "z" * 40)], [short])
    assert got[1] == (0, -1)


def test_first_hit_pos_is_grid_aligned_min(spark):
    secret = "shared-secret-region-" * 3  # 63 chars
    doc = "a" * 25 + secret + "b" * 25
    got = _hits(spark, [(1, doc)], [secret])
    n, pos = got[1]
    assert pos % S == 0
    assert 25 <= pos <= 25 + len(secret) - W
    # every grid window fully inside the region matches
    assert n == len([p for p in range(0, len(doc) - W + 1, S) if p >= 25 and p + W <= 25 + len(secret)])


def test_short_docs_and_empty_bench(spark):
    got = _hits(spark, [(1, "tiny"), (2, "x" * 100)], ["irrelevant benchmark text here"])
    assert got[1] == (0, -1)  # doc shorter than window still reported
    assert got[2] == (0, -1)

"""Deterministic sampling/splitting and substring-duplication spans:
hand-checkable planted inputs, plus the invariants that make these
operators safe at corpus scale (reproducibility across partitionings,
salt independence of the split, exact island merging)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators import dedup
from insurance_pdf_extractor_spark.operators.sampling import (
    hash_sample_expr,
    hash_split_expr,
    hex_threshold,
    stratified_sample,
)


@pytest.fixture(scope="module")
def keyed_df(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "es").otherwise("de").alias("lang"),
    )


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "000000000000"
    assert hex_threshold(1.0) == "g" * 12  # above every hex digest: keep all
    assert hex_threshold(0.5) == "800000000000"
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_sample_rate_and_determinism(keyed_df):
    kept = keyed_df.filter(hash_sample_expr(F.col("doc_id"), 0.3))
    n = kept.count()
    # md5 is uniform: 2000 draws at p=0.3 -> ~600 +/- 5 sigma (~102)
    assert 498 <= n <= 702
    # identical decision set under a different partitioning
    again = keyed_df.repartition(7, "lang").filter(hash_sample_expr(F.col("doc_id"), 0.3))
    assert kept.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    assert again.count() == n
    # monotone: raising the rate only ever ADDS keys (same salt)
    more = keyed_df.filter(hash_sample_expr(F.col("doc_id"), 0.6))
    assert kept.select("doc_id").exceptAll(more.select("doc_id")).count() == 0


def test_stratified_rates(keyed_df):
    out = stratified_sample(
        keyed_df, F.col("doc_id"), F.col("lang"), {"en": 1.0, "es": 0.25}, default=0.0
    )
    by = dict(out.groupBy("lang").count().collect())
    assert by.get("en") == 667  # fraction 1.0 keeps every en row
    assert "de" not in by  # default 0.0 drops the rest
    assert 100 <= by.get("es", 0) <= 233  # ~167 +/- 5 sigma


def test_split_labels_and_salt_independence(keyed_df):
    labeled = keyed_df.select("doc_id", hash_split_expr(F.col("doc_id")).alias("split"))
    by = dict(labeled.groupBy("split").count().collect())
    assert set(by) == {"train", "val", "test"}
    assert by["train"] > by["val"] and by["train"] > by["test"]
    assert sum(by.values()) == 2000
    # sampling at ANY rate never moves a doc across splits: the split
    # label recomputed on the sampled subset matches the full-corpus
    # label for every surviving doc (different salts -> independent)
    resampled = (
        keyed_df.filter(hash_sample_expr(F.col("doc_id"), 0.5))
        .select("doc_id", hash_split_expr(F.col("doc_id")).alias("split2"))
    )
    moved = resampled.join(labeled, "doc_id").filter(F.col("split2") != F.col("split"))
    assert moved.count() == 0
    with pytest.raises(ValueError):
        hash_split_expr(F.col("doc_id"), {"train": 0.5, "val": 0.1})


def test_duplicated_spans_planted(spark):
    boiler = "B" * 45  # shared 45-char run: every 40-window inside it on the stride grid dups
    rows = [
        (0, "x" * 30 + boiler + "y" * 30),
        (1, "p" * 25 + boiler + "q" * 35),
        (2, "unique text without any repeats " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicated_ngram_spans(df, window=40, stride=5, min_count=2).collect()
    got = {r.doc_id: r for r in out}
    assert len(got) == 3
    # "B"*45 inside docs 0 and 1 shares grid windows; doc 2 is clean.
    # A doc of one repeated char also self-dups ("x"*30 is < window, so
    # only the planted boilerplate region can fire).
    assert got[0].dup_spans >= 1 and got[0].dup_chars >= 40
    assert got[1].dup_spans >= 1 and got[1].dup_chars >= 40
    assert got[2].dup_spans == 0 and got[2].dup_chars == 0 and got[2].dup_fraction == 0.0


def test_duplicated_spans_islands_merge(spark):
    # two exact-duplicate docs: every grid window dups, so the merged
    # span must be ONE island covering [0, len) per doc — the
    # gaps-and-islands logic, not one span per window.
    text = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
    df = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.duplicated_ngram_spans(df, window=40, stride=20, min_count=2).collect()
    }
    n = len(text)
    # last grid-aligned window starts at the largest multiple of 20 <= n-40
    last_start = ((n - 40) // 20) * 20
    for r in out.values():
        assert r.dup_spans == 1
        assert r.dup_chars == last_start + 40


def test_duplicated_spans_short_docs_zero(spark):
    df = spark.createDataFrame([(0, "short"), (1, "short")], "doc_id long, text string")
    out = dedup.duplicated_ngram_spans(df, window=40, stride=20).collect()
    assert all(r.dup_spans == 0 and r.dup_fraction == 0.0 for r in out)


def test_remove_duplicated_spans_rewrite(spark):
    # planted shared boilerplate: the rewrite must cut EXACTLY the
    # merged island and stitch the flanks back together in order
    boiler = "B" * 45
    rows = [
        (0, "x" * 30 + boiler + "y" * 30),
        (1, "p" * 25 + boiler + "q" * 35),
        (2, "unique text without any repeats " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r.doc_id: r
        for r in dedup.duplicated_ngram_spans(df, window=40, stride=5, min_count=2).collect()
    }
    out = {
        r.doc_id: r
        for r in dedup.remove_duplicated_spans(df, window=40, stride=5, min_count=2).collect()
    }
    originals = dict(rows)
    for i in (0, 1, 2):
        # invariant: the rewrite removes exactly dup_chars characters
        assert out[i].removed_chars == stats[i].dup_chars
        assert len(out[i].text_clean) == len(originals[i]) - stats[i].dup_chars
    # clean doc passes through untouched
    assert out[2].text_clean == originals[2] and out[2].removed_chars == 0
    # the flanks survive, the boilerplate is gone, order preserved
    assert "B" not in out[0].text_clean or out[0].text_clean.count("B") < 45
    assert out[0].text_clean.startswith("x") and out[0].text_clean.endswith("y" * 5)


def test_remove_duplicated_spans_whole_doc(spark):
    # two exact-duplicate docs where the merged island covers the grid
    # reach: only the ungridded tail (< window + stride - 1 chars)
    # survives — the rewrite result equals the complement of the span
    text = "the quick brown fox jumps over the lazy dog " * 4  # 180 chars
    df = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.remove_duplicated_spans(df, window=40, stride=20).collect()}
    n = len(text)
    cut_end = ((n - 40) // 20) * 20 + 40  # island = [0, last grid window end)
    for r in out.values():
        assert r.text_clean == text[cut_end:]
        assert r.removed_chars == cut_end


def test_remove_duplicated_spans_interior_island(spark):
    # duplicated region strictly interior: prefix + suffix concatenate
    pre, post = "start-segment " * 5, " end-segment" * 5
    boiler = "Z" * 80
    df = spark.createDataFrame(
        [(0, pre + boiler + post), (1, "other lead " * 7 + boiler + "other tail " * 7)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.remove_duplicated_spans(df, window=40, stride=20).collect()}
    # doc 0's cleaned text is exactly prefix+suffix minus whatever part
    # of the island the grid reached; the island is inside the Z-run
    assert "Z" * 40 not in out[0].text_clean
    assert out[0].text_clean.startswith(pre[:10])
    assert out[0].text_clean.endswith(post[-10:])


def test_duplicated_window_positions_args(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dedup.duplicated_window_positions(df, window=0)
    with pytest.raises(ValueError):
        dedup.duplicated_window_positions(df, stride=-1)


# --- Gopher repetition signals (text_quality.repetition_stats) --------------


def test_repetition_stats_planted(spark):
    from insurance_pdf_extractor_spark.operators import text_quality as tq

    rows = [
        (0, "spam ham " * 10),                 # one bigram dominates
        (1, "a b c d e f g h i j"),            # all distinct: no repeats
        (2, "x y z w v x y z w v x y z w v"),  # repeated 5-gram block
        (3, "one"),                            # n_words < 2: all zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tq.repetition_stats(df).collect()}

    # doc 0: words = [spam ham]*10, n=20. Bigram (spam,ham) occurs 10x,
    # (ham,spam) 9x -> top=10, frac=10*2/20=1.0. Every 5-gram position
    # (16 of them) repeats -> dup_5gram_frac=1.0.
    assert got[0].n_words == 20 and got[0].top_bigram_count == 10
    assert got[0].top_bigram_frac == 1.0 and got[0].dup_5gram_frac == 1.0
    # doc 1: 10 distinct words -> top bigram count 1, no dup 5-grams
    assert got[1].top_bigram_count == 1
    assert got[1].top_bigram_frac == 0.2 and got[1].dup_5gram_frac == 0.0
    # doc 2: "x y z w v" * 3 -> n=15; (x,y) occurs 3x -> frac 3*2/15=0.4;
    # 11 5-gram positions, the 5 distinct cyclic 5-grams occur 3,2,2,2,2
    # times -> all 11 positions duplicated -> 1.0
    assert got[2].n_words == 15 and got[2].top_bigram_count == 3
    assert got[2].top_bigram_frac == 0.4 and got[2].dup_5gram_frac == 1.0
    # doc 3: single word -> degenerate zeros
    assert got[3].n_words == 1 and got[3].top_bigram_count == 0
    assert got[3].top_bigram_frac == 0.0 and got[3].dup_5gram_frac == 0.0


def test_repetition_stats_null_and_empty(spark):
    from insurance_pdf_extractor_spark.operators import text_quality as tq

    df = spark.createDataFrame([(0, None), (1, "   ")], "doc_id long, text string")
    got = {r.doc_id: r for r in tq.repetition_stats(df).collect()}
    # null/blank text -> one empty word (matches the DuckDB
    # regexp_split_to_array convention), zero repetition everywhere
    for r in got.values():
        assert r.n_words == 1 and r.top_bigram_count == 0
        assert r.top_bigram_frac == 0.0 and r.dup_5gram_frac == 0.0

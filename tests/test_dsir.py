"""DSIR importance resampling (operators/sampling.py): model parity
with an independent pure-Python implementation, deterministic Gumbel
selection, and the broadcast plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.sampling import (
    dsir_bucket_table,
    dsir_scores,
    dsir_select,
)

M = 64  # buckets — small so collisions actually occur in the test


def _py_words(text):
    return [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if w]


def _py_feats(text):
    ws = _py_words(text)
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_bucket(feat):
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % M


def _py_counts(texts):
    c = {}
    for t in texts:
        for f in _py_feats(t):
            b = _py_bucket(f)
            c[b] = c.get(b, 0) + 1
    return c


TARGET = [
    "alpha beta gamma alpha",
    "beta gamma delta",
    "alpha alpha beta",
]
RAW = TARGET + [
    "zeta eta theta iota",
    "kappa zeta zeta lambda",
    "mu nu xi omicron pi",
    "theta theta kappa",
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame([(i, s) for i, s in enumerate(TARGET)], "doc_id long, text string")
    r = spark.createDataFrame([(i, s) for i, s in enumerate(RAW)], "doc_id long, text string")
    return t, r


def test_bucket_table_matches_pure_python(spark, frames):
    t, r = frames
    table = {row["bucket"]: row["logratio"] for row in dsir_bucket_table(t, r, n_buckets=M).collect()}
    assert set(table) == set(range(M))
    ct, cr = _py_counts(TARGET), _py_counts(RAW)
    tot_t, tot_r = sum(ct.values()), sum(cr.values())
    for b in range(M):
        exp = math.log((ct.get(b, 0) + 1.0) / (tot_t + M)) - math.log(
            (cr.get(b, 0) + 1.0) / (tot_r + M)
        )
        assert table[b] == pytest.approx(exp, abs=1e-12)


def test_scores_match_pure_python(spark, frames):
    t, r = frames
    table = dsir_bucket_table(t, r, n_buckets=M)
    got = {row["doc_id"]: (row["n_feats"], row["logw"]) for row in dsir_scores(r, table, n_buckets=M).collect()}
    ct, cr = _py_counts(TARGET), _py_counts(RAW)
    tot_t, tot_r = sum(ct.values()), sum(cr.values())

    def lr(b):
        return math.log((ct.get(b, 0) + 1.0) / (tot_t + M)) - math.log(
            (cr.get(b, 0) + 1.0) / (tot_r + M)
        )

    for i, text in enumerate(RAW):
        feats = _py_feats(text)
        exp = sum(lr(_py_bucket(f)) for f in feats)
        assert got[i][0] == len(feats)
        assert got[i][1] == pytest.approx(exp, rel=1e-9)
    # target-like docs must outscore off-distribution docs
    assert min(got[i][1] for i in range(3)) > max(got[i][1] for i in range(3, len(RAW)))


def test_empty_doc_scores_zero(spark, frames):
    t, r = frames
    docs = r.unionByName(
        r.sparkSession.createDataFrame([(99, "   ")], "doc_id long, text string")
    )
    table = dsir_bucket_table(t, r, n_buckets=M)
    row = {x["doc_id"]: x for x in dsir_scores(docs, table, n_buckets=M).collect()}[99]
    assert (row["n_feats"], row["logw"]) == (0, 0.0)


def test_select_deterministic_and_nested(spark, frames):
    t, r = frames
    table = dsir_bucket_table(t, r, n_buckets=M)
    sel3a = {x["doc_id"] for x in dsir_select(r, table, k=3, n_buckets=M).collect()}
    sel3b = {
        x["doc_id"]
        for x in dsir_select(r.repartition(7), table, k=3, n_buckets=M).collect()
    }
    assert sel3a == sel3b  # parallelism-invariant
    sel5 = {x["doc_id"] for x in dsir_select(r, table, k=5, n_buckets=M).collect()}
    assert sel3a <= sel5  # Gumbel top-k keys nest across k


def test_scoring_join_is_broadcast(spark, frames):
    t, r = frames
    plan = dsir_scores(r, dsir_bucket_table(t, r, n_buckets=M), n_buckets=M)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_select_fraction_is_map_side_and_approx(spark, frames):
    t, r = frames
    from insurance_pdf_extractor_spark.operators.sampling import dsir_select_fraction

    table = dsir_bucket_table(t, r, n_buckets=M)
    # tiny corpus: exact-k and fraction paths must agree on the extremes
    all_rows = dsir_select_fraction(r, table, 1.0, n_buckets=M)
    assert all_rows.count() == len(RAW)
    some = dsir_select_fraction(r, table, 0.5, n_buckets=M)
    n = some.count()
    assert 0 < n <= len(RAW)
    # fraction selection == top-n by gumbel key (same cutoff semantics)
    top = {x["doc_id"] for x in dsir_select(r, table, k=n, n_buckets=M).collect()}
    assert {x["doc_id"] for x in some.collect()} == top
    with pytest.raises(ValueError):
        dsir_select_fraction(r, table, 0.0, n_buckets=M)


def test_curate_job_dsir_selection(spark, tmp_path):
    """jobs/curate.py --dsir-target: importance selection gates which
    raw docs enter curation; kept survivors shrink vs the plain run."""
    import contextlib
    import io
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs import curate

    src = "/root/testdata/sf0.001/documents.parquet"
    target_dir = str(tmp_path / "target")
    spark.read.parquet(src).filter(F.col("doc_id") % 7 == 0).write.parquet(target_dir)

    def run(args):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            curate.main(args)
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    plain = run(["--input", src, "--output", str(tmp_path / "plain"), "--skip-funnel"])
    dsir = run(
        [
            "--input", src, "--output", str(tmp_path / "dsir"), "--skip-funnel",
            "--dsir-target", target_dir, "--dsir-frac", "0.4", "--dsir-buckets", "256",
        ]
    )
    assert 0 < dsir["survivors"] < plain["survivors"]

"""curate_corpus: the full funnel on a corpus with planted junk, PII,
exact dups, and near-dups — counts drop monotonically, the right docs
survive, and the packing tiles the survivors exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.plans.curation import curate_corpus, stage_counts

def _doc(i: int) -> str:
    # stopword-rich opener for the quality gate, then a per-doc-unique
    # body so distinct docs share almost no shingles (Jaccard ~0)
    body = " ".join(f"tok{i}x{j}" for j in range(25))
    return f"the story of item {i} is that " + body


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _doc(i)) for i in range(40)]                     # distinct good docs
    rows.append((100, "tiny"))                                   # under min_tokens
    rows.append((101, ("spam " * 200).strip()))                  # repetition junk
    rows.append((102, _doc(0)))                                  # exact dup of 0
    rows.append((103, _doc(1) + " extraword"))                   # near dup of 1
    rows.append((104, _doc(104).replace("tok104x3", "jane.doe@example.com")))  # distinct doc with PII
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def curated(corpus):
    return curate_corpus(corpus, min_tokens=8, min_quality=0.1, min_jaccard=0.5)


def test_funnel_monotone(spark, curated):
    counts = stage_counts(curated)
    order = ["raw", "quality", "exact_dedup", "near_dedup", "sampled"]
    vals = [counts[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["raw"] == 45
    assert counts["quality"] <= 43  # junk docs gone


def test_right_docs_dropped(spark, curated):
    ids = {r["doc_id"] for r in curated["survivors"].select("doc_id").collect()}
    assert 100 not in ids          # too short
    assert 101 not in ids          # repetition junk
    assert 102 not in ids          # exact dup loses to min id 0
    assert 0 in ids
    # near-dup pair (1, 103): cluster keeps the minimum
    assert not {1, 103} <= ids
    assert 1 in ids


def test_pii_redacted(spark, curated):
    row = curated["survivors"].filter(F.col("doc_id") == 104).collect()
    assert row, "PII doc should survive (content is fine once redacted)"
    assert "example.com" not in row[0]["text"]
    assert "<EMAIL>" in row[0]["text"]


def test_packing_tiles_survivors(spark, curated):
    total = (
        curated["survivors"].agg(F.sum("n_tokens")).collect()[0][0]
    )
    pk = curated["packing"].toPandas()
    assert int((pk["end_in_chunk"] - pk["begin_in_chunk"]).sum()) == total
    assert set(pk["doc_id"]) <= {
        r["doc_id"] for r in curated["survivors"].select("doc_id").collect()
    }


def test_split_labels_partition(spark, curated):
    splits = curated["survivors"].groupBy("split").count().collect()
    assert {r["split"] for r in splits} <= {"train", "val", "test"}
    assert sum(r["count"] for r in splits) == curated["survivors"].count()


def test_curate_job_cli_end_to_end(spark, tmp_path):
    """jobs/curate.py --input/--output/--history: the spark-submit
    packaging surface for the curation pipeline. History = the same
    corpus must yield zero survivors (every batch doc is a cross-batch
    duplicate dropped by dedup.history_filter)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs import curate

    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path / "fresh")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate.main(["--input", src, "--output", out1, "--skip-funnel"])
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["survivors"] > 0 and res["chunks"] is not None
    assert spark.read.parquet(f"{out1}/survivors").count() == res["survivors"]

    out2 = str(tmp_path / "dup")
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        curate.main(
            ["--input", src, "--history", src, "--output", out2, "--skip-funnel"]
        )
    res2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert res2["survivors"] == 0


def _dir_state(root, stage):
    """(filename, mtime_ns, size) of a stage's parquet dir — unchanged
    state proves the stage was NOT re-executed."""
    import os

    d = os.path.join(root, stage)
    return sorted(
        (f, os.stat(os.path.join(d, f)).st_mtime_ns, os.stat(os.path.join(d, f)).st_size)
        for f in os.listdir(d)
    )


def test_curate_kill_resume(spark, corpus, tmp_path):
    """North-rule resumability for the curation funnel: kill after the
    dedup stage, re-run with the same run_id → the completed stages are
    loaded (their files untouched), only the missing stages execute,
    and the final output equals an uninterrupted run."""
    from insurance_pdf_extractor_spark.plans.curation import run_curate_job

    kw = dict(min_tokens=8, min_quality=0.1, min_jaccard=0.5)
    out = str(tmp_path / "resumed")

    r1 = run_curate_job(corpus, out, "run-a", _stop_after="near_dedup", **kw)
    assert r1["stages_run"] == ["quality", "exact_dedup", "near_dedup"]
    assert not (tmp_path / "resumed" / "survivors").exists()
    before = {s: _dir_state(out, s) for s in r1["stages_run"]}

    r2 = run_curate_job(corpus, out, "run-a", **kw)
    assert r2["stages_skipped"] == ["quality", "exact_dedup", "near_dedup"]
    assert r2["stages_run"] == ["survivors", "packing"]
    # only missing work re-executed: completed stage files untouched
    assert {s: _dir_state(out, s) for s in r2["stages_skipped"]} == before

    # resumed output == uninterrupted run
    clean = str(tmp_path / "clean")
    r3 = run_curate_job(corpus, clean, "run-b", **kw)
    assert r3["stages_run"] == list(r1["stages_run"]) + list(r2["stages_run"])

    def rows(root, name):
        return {tuple(r) for r in spark.read.parquet(f"{root}/{name}").collect()}

    assert rows(out, "survivors") == rows(clean, "survivors")
    assert rows(out, "packing") == rows(clean, "packing")

    # fully-checkpointed run: nothing to do
    r4 = run_curate_job(corpus, out, "run-a", **kw)
    assert r4["stages_run"] == [] and len(r4["stages_skipped"]) == 5


def test_curate_job_cli_resumable(spark, tmp_path):
    """--run-id through the CLI surface: second invocation skips all
    five stages."""
    import contextlib
    import io
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs import curate

    src = "/root/testdata/sf0.001/documents.parquet"
    out_dir = str(tmp_path / "cli")

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            curate.main(
                ["--input", src, "--output", out_dir, "--run-id", "cli-1", "--skip-funnel"]
            )
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    first = run()
    assert first["stages_run"] == list(
        ("quality", "exact_dedup", "near_dedup", "survivors", "packing")
    )
    assert first["survivors"] > 0
    second = run()
    assert second["stages_run"] == [] and len(second["stages_skipped"]) == 5
    assert second["survivors"] == first["survivors"]


def test_curate_job_profile_flag(spark, tmp_path):
    """--profile (r4 verdict #8): the job writes profile_vocab +
    profile_tfidf alongside survivors/packing, and both artifacts equal
    the standalone operators computed over the survivors — evidence the
    shared-scan corpus_profile path is reachable from spark-submit."""
    import contextlib
    import io
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from jobs import curate
    from insurance_pdf_extractor_spark.operators import text_quality as tq

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "prof")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curate.main(["--input", src, "--output", out, "--skip-funnel", "--profile"])
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["survivors"] > 0

    survivors = spark.read.parquet(f"{out}/survivors")
    vocab = spark.read.parquet(f"{out}/profile_vocab")
    tfidf = spark.read.parquet(f"{out}/profile_tfidf")
    want_vocab = {tuple(r) for r in tq.vocab_topk(survivors).collect()}
    assert {tuple(r) for r in vocab.collect()} == want_vocab and want_vocab
    want_tfidf = {tuple(r) for r in tq.tfidf_top_terms(survivors).collect()}
    assert {tuple(r) for r in tfidf.collect()} == want_tfidf and want_tfidf

    # resumable path: profile is a checkpointed stage — a second run
    # with the same run_id skips it
    out2 = str(tmp_path / "prof_resume")
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        curate.main(
            ["--input", src, "--output", out2, "--run-id", "p1", "--profile"]
        )
    r1 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert "profile" in r1["stages_run"]
    buf3 = io.StringIO()
    with contextlib.redirect_stdout(buf3):
        curate.main(
            ["--input", src, "--output", out2, "--run-id", "p1", "--profile"]
        )
    r2 = json.loads(buf3.getvalue().strip().splitlines()[-1])
    assert "profile" in r2["stages_skipped"]

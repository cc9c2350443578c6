"""Kill-resume semantics: a run that dies after k buckets resumes
processing ONLY the missing buckets, and the final table equals a
single uninterrupted run."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import corpus as C
from insurance_pdf_extractor_spark.plans.checkpoint import run_extract_job


def _spans_map(spark, path):
    df = spark.read.parquet(path)
    return {r["doc_id"]: r["spans"] for r in df.collect()}


def test_kill_resume(spark, corpus_docs, tmp_path):
    raw = C.to_raw_df(spark, corpus_docs[:60])

    full_dir = str(tmp_path / "full")
    run_extract_job(raw, full_dir, run_id="r1", n_buckets=8)
    full = _spans_map(spark, f"{full_dir}/documents")

    # interrupted run: only 3 of 8 buckets complete
    part_dir = str(tmp_path / "partial")
    stats1 = run_extract_job(raw, part_dir, run_id="r1", n_buckets=8, _limit_buckets=3)
    assert stats1["buckets_completed"] == 3
    partial = _spans_map(spark, f"{part_dir}/documents")
    assert 0 < len(partial) < len(full)

    # resume: processes exactly the remaining 5 buckets
    stats2 = run_extract_job(raw, part_dir, run_id="r1", n_buckets=8)
    assert stats2["buckets_completed"] == 5
    resumed = _spans_map(spark, f"{part_dir}/documents")
    assert resumed == full

    # re-run after completion: nothing left to do (idempotent)
    stats3 = run_extract_job(raw, part_dir, run_id="r1", n_buckets=8)
    assert stats3["buckets_completed"] == 0
    assert _spans_map(spark, f"{part_dir}/documents") == full

    # checkpoint table carries lineage counters
    ck = spark.read.parquet(f"{part_dir}/checkpoint")
    assert ck.filter(F.col("run_id") == "r1").count() == 8
    row = ck.filter(F.col("docs_processed") > 0).first()
    assert row["extractor_version"]
    assert row["spans_emitted"] > 0
    assert row["wall_ms"] >= 0


def test_all_rejected_batch_still_checkpoints(spark, tmp_path):
    """A pending batch in which EVERY document is rejected writes an
    empty (schemaless) documents dir; the lineage read-back must
    tolerate it — symmetric to the zero-rejects case — and record
    docs_processed=0 with the right reject counters."""
    from insurance_pdf_extractor_spark.plans.checkpoint import run_extract_job
    from insurance_pdf_extractor_spark.schema import DOCUMENTS_RAW

    rows = [(f"bad-{i}", b"NOTPDF garbage", [], 1, 14) for i in range(10)]
    raw = spark.createDataFrame(rows, DOCUMENTS_RAW)
    out = str(tmp_path / "rejonly")
    stats = run_extract_job(raw, out, run_id="rejonly", n_buckets=4)
    assert stats["buckets_completed"] > 0
    ck = spark.read.parquet(f"{out}/checkpoint")
    agg = ck.agg({"docs_rejected": "sum", "docs_processed": "sum"}).collect()[0]
    assert agg["sum(docs_rejected)"] == 10
    assert agg["sum(docs_processed)"] == 0

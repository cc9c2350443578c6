"""End-to-end Spark pipeline tests: span-sequence equality vs corpus
ground truth, reject routing, sharded-path equivalence, and
partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import corpus as C
from insurance_pdf_extractor_spark.plans.pipeline import build_results, extract_documents
from insurance_pdf_extractor_spark.schema import DOCUMENTS


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus_docs):
    raw = C.to_raw_df(spark, corpus_docs)
    docs, rejects = extract_documents(
        raw, max_size_bytes=60_000, shard_size_bytes=8_192, shard_pages=4, partitions=4
    )
    return raw, docs.cache(), rejects.cache()


def _expected_spans_map(corpus_docs, max_size_bytes=60_000):
    out = {}
    for d in corpus_docs:
        if d.expected_spans is None or len(d.content) > max_size_bytes:
            continue
        out[d.doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d.expected_spans
        ]
    return out


def test_span_sequence_equality(pipeline_out, corpus_docs):
    _raw, docs, _rejects = pipeline_out
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in docs.collect()
    }
    exp = _expected_spans_map(corpus_docs)
    assert set(got) == set(exp)
    for doc_id, espans in exp.items():
        assert got[doc_id] == espans, f"{doc_id} span mismatch"


def test_rejects_routed(pipeline_out, corpus_docs):
    _raw, _docs, rejects = pipeline_out
    got = {r["doc_id"]: r["reject_reason"] for r in rejects.collect()}
    exp_empty = {d.doc_id for d in corpus_docs if d.n_pages == 0}
    exp_oversize = {d.doc_id for d in corpus_docs if len(d.content) > 60_000}
    for doc_id in exp_empty:
        assert got[doc_id] == "no_pages"
    for doc_id in exp_oversize:
        assert got[doc_id] == "size_exceeds_limit"
    assert set(got) == exp_empty | exp_oversize
    assert rejects.filter(F.col("status") != "error").count() == 0


def test_sharded_path_used_and_equivalent(spark, corpus_docs):
    """Big docs go through shard→merge and must produce identical spans
    to the fused path."""
    big = [d for d in corpus_docs if d.n_pages >= 10 and d.expected_spans is not None][:5]
    assert big
    raw = C.to_raw_df(spark, big)
    sharded, _ = extract_documents(raw, shard_size_bytes=1, shard_pages=3, partitions=2)
    fused, _ = extract_documents(raw, shard_size_bytes=10**9, partitions=2)
    a = {r["doc_id"]: r["spans"] for r in sharded.collect()}
    b = {r["doc_id"]: r["spans"] for r in fused.collect()}
    assert a == b


def test_parallelism_invariance(spark, corpus_docs):
    """Identical output at different partition counts (north rule: all
    ordering derives from data, never task order)."""
    sample = [d for d in corpus_docs if d.expected_spans is not None][:40]
    raw = C.to_raw_df(spark, sample)
    out1, _ = extract_documents(raw, partitions=1)
    out8, _ = extract_documents(raw, partitions=8)
    rows1 = {r["doc_id"]: r["spans"] for r in out1.collect()}
    rows8 = {r["doc_id"]: r["spans"] for r in out8.collect()}
    assert rows1 == rows8


def test_records_match_oracle(pipeline_out, corpus_docs):
    _raw, docs, _ = pipeline_out
    results = build_results(docs)
    got = {r["doc_id"]: r.asDict() for r in results.collect()}
    exp_rows = {r["doc_id"]: r for r in C.expected_record_rows(corpus_docs)}
    from insurance_pdf_extractor_spark.constants import FIELD_NAMES

    checked = 0
    for doc_id, row in got.items():
        exp = exp_rows.get(doc_id)
        if exp is None:
            continue
        for f in FIELD_NAMES:
            g, e = row[f], exp[f]
            if f == "issuing_carrier":
                g = list(g) if g is not None else []
            assert g == e, f"{doc_id}.{f}: {g!r} != {e!r}"
        assert row["status"] == exp["status"], f"{doc_id} status"
        assert list(row["warnings"]) == exp["warnings"], f"{doc_id} warnings"
        checked += 1
    assert checked >= 90


def test_documents_schema(pipeline_out):
    _raw, docs, _ = pipeline_out
    assert docs.schema == DOCUMENTS or [f.name for f in docs.schema.fields] == ["doc_id", "spans"]


def test_extract_results_parallelism_invariant(spark, corpus_docs):
    """The single-pass plan emits identical rows at different partition
    counts (north rule: all ordering data-derived)."""
    from insurance_pdf_extractor_spark.plans.pipeline import extract_results
    from insurance_pdf_extractor_spark import corpus as C

    raw = C.to_raw_df(spark, corpus_docs[:40])

    def snapshot(partitions):
        res = extract_results(raw, partitions=partitions)
        rows = res.select("doc_id", "status", "extracted_data", "warnings", "file_size").collect()
        return sorted((r["doc_id"], r["status"], r["extracted_data"], tuple(r["warnings"] or []), r["file_size"]) for r in rows)

    assert snapshot(2) == snapshot(16)


def test_materialized_source_value_identical(spark, corpus_docs):
    """materialized_source changes only WHERE the branches read from
    (one cached materialization vs per-branch re-execution of a
    computed source) — never the rows. Compare full results frames."""
    from insurance_pdf_extractor_spark.plans.pipeline import extract_results, materialized_source
    from insurance_pdf_extractor_spark import corpus as C

    raw = C.to_raw_df(spark, corpus_docs[:40])

    def snapshot(df):
        rows = df.select(
            "doc_id", "status", "extracted_data", "warnings", "file_size"
        ).collect()
        return sorted(
            (r["doc_id"], r["status"], r["extracted_data"], tuple(r["warnings"] or []), r["file_size"])
            for r in rows
        )

    base = snapshot(extract_results(raw, partitions=4))
    with materialized_source(raw) as shared_raw:
        shared = snapshot(extract_results(shared_raw, partitions=4))
        # the branches must actually read the cache, not re-plan around it
        plan = extract_results(shared_raw, partitions=4)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    assert base == shared

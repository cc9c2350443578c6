"""pack_documents invariants: the chunk stream must tile exactly —
every token position covered once, chunk boundaries respected, layout
invariant to input partitioning, and the bucketed two-phase prefix sum
equal to a single-threaded reference layout."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators.packing import pack_documents

BUDGET = 64


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 7919) % 150) for i in range(200)]  # includes 0-token docs
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _reference_layout(rows, salt=":pack"):
    """Single-threaded oracle: sort by (md5 prefix, id), running offset."""
    def okey(i):
        return hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:12]

    out, off = {}, 0
    for i, tok in sorted(rows, key=lambda r: (okey(r[0]), r[0])):
        out[i] = (off, tok)
        off += tok
    return out, off


def test_matches_reference_layout(spark, docs):
    got = pack_documents(docs, budget=BUDGET).toPandas()
    ref, total = _reference_layout([(r.doc_id, r.n_tokens) for r in docs.collect()])
    starts = dict(zip(got["doc_id"], got["start_offset"]))
    for doc_id, (off, tok) in ref.items():
        if tok > 0:
            assert starts[doc_id] == off, doc_id
    # chunk rows per doc = number of budget windows the interval crosses
    for doc_id, grp in got.groupby("doc_id"):
        off, tok = ref[doc_id]
        first, last = off // BUDGET, (off + tok - 1) // BUDGET
        assert sorted(grp["chunk_id"]) == list(range(first, last + 1))


def test_exact_tiling(spark, docs):
    """Summed (end-begin) == total tokens; no overlaps within a chunk."""
    got = pack_documents(docs, budget=BUDGET).toPandas()
    total_tokens = docs.agg(F.sum("n_tokens")).collect()[0][0]
    assert int((got["end_in_chunk"] - got["begin_in_chunk"]).sum()) == total_tokens
    assert (got["begin_in_chunk"] >= 0).all()
    assert (got["end_in_chunk"] <= BUDGET).all()
    assert (got["end_in_chunk"] > got["begin_in_chunk"]).all()
    for chunk_id, grp in got.groupby("chunk_id"):
        segs = sorted(zip(grp["begin_in_chunk"], grp["end_in_chunk"]))
        for (b1, e1), (b2, _e2) in zip(segs, segs[1:]):
            assert e1 == b2, f"gap/overlap in chunk {chunk_id}"
        # every chunk except the stream's last is completely full
        assert segs[0][0] == 0


def test_zero_token_docs_emit_nothing(spark, docs):
    got = pack_documents(docs, budget=BUDGET)
    zero_ids = [r.doc_id for r in docs.filter(F.col("n_tokens") == 0).collect()]
    assert zero_ids  # fixture really has some
    assert got.filter(F.col("doc_id").isin(zero_ids)).count() == 0


def test_partitioning_invariance(spark, docs):
    a = pack_documents(docs.repartition(13), budget=BUDGET).collect()
    b = pack_documents(docs.coalesce(1), budget=BUDGET).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bucket_chars_invariance(spark, docs):
    """1-char (16) and 2-char (256) bucket grids give the SAME layout —
    the prefix-of-order-key property that lets the oracle ignore
    bucketing entirely."""
    a = pack_documents(docs, budget=BUDGET, bucket_chars=1).collect()
    b = pack_documents(docs, budget=BUDGET, bucket_chars=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

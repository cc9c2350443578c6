"""Core per-row invariant (BASELINE.json:15): span-sequence equality
(kind, text, media_ref, order) between the engine's extraction and the
corpus ground truth, which is computed from the logical layout by the
pure-Python oracle — independent of the content-stream parser."""

from __future__ import annotations

from insurance_pdf_extractor_spark.operators.assemble import extract_spans


def test_roundtrip_span_equality(corpus_docs):
    checked = 0
    for d in corpus_docs:
        if d.expected_spans is None:
            continue
        media = [(m["media_ref"], m["offset"]) for m in d.media]
        got = extract_spans(d.content, media, d.n_pages)
        exp = d.expected_spans
        assert len(got) == len(exp), f"{d.doc_id}: {len(got)} vs {len(exp)} spans"
        for order, (g, e) in enumerate(zip(got, exp)):
            assert (g["kind"], g["text"], g["media_ref"]) == (
                e["kind"],
                e["text"],
                e["media_ref"],
            ), f"{d.doc_id} span {order}: {g} != {e}"
            assert g["offset"] == e["offset"], f"{d.doc_id} span {order} offset"
        checked += 1
    assert checked > 100


def test_corpus_has_variety(corpus_docs):
    statuses = {d.status for d in corpus_docs}
    assert statuses == {"success", "partial_success", "error"}
    assert any(d.n_pages >= 10 for d in corpus_docs)          # sharding path
    assert any(len(d.content) > 65000 for d in corpus_docs)   # oversize path
    assert any(d.media for d in corpus_docs if d.media is not None)
    assert any(d.warnings for d in corpus_docs)

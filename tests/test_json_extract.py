"""F1/F2 LLM-response parsing parity with the reference's
_extract_json_from_response / _manual_json_extraction
(app/services/gemini.py:197-284), including its own test cases
(tests/test_services/test_gemini_service.py:46-66)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.functions.json_extract import (
    extract_json_cascade_expr,
    manual_kv_scrape_expr,
    parse_llm_response_expr,
)


def _parse(spark, texts, expr_fn=parse_llm_response_expr):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, txt string")
    rows = df.select("i", expr_fn(F.col("txt")).alias("m")).orderBy("i").collect()
    return [r["m"] for r in rows]


def test_json_code_block_strategy(spark):
    # the reference's mock shape: ```json { ... } ```
    out = _parse(
        spark,
        ['Here you go:\n```json\n{"quote_number": "WC-123", "premium": "$1,000"}\n```\ndone'],
        extract_json_cascade_expr,
    )
    assert out[0] == {"quote_number": "WC-123", "premium": "$1,000"}


def test_strategy_order_and_fallthrough(spark):
    texts = [
        '```\n{"a": "generic block"}\n```',          # strategy 2
        'the JSON {"a": "keyword"} trailing',         # strategy 3 (case-insensitive "json")
        'prefix {"a": "bare"} suffix',                # strategy 4
        '```json\n{not valid json}\n```\n{"a": "recovered"}',  # s1 fails to parse -> s4 wins
    ]
    out = _parse(spark, texts, extract_json_cascade_expr)
    assert [m["a"] for m in out] == ["generic block", "keyword", "bare", "recovered"]


def test_empty_object_rejected(spark):
    # {} parses but is empty -> strategy rejected (gemini.py:231); falls
    # through to manual scrape, which also finds nothing -> null
    out = _parse(spark, ["```json\n{}\n```ok"])
    assert out[0] is None


def test_manual_kv_fallback(spark):
    text = 'quote_number: "WC-9"\n"status": partial\nempty_field: \nnull_field: null'
    out = _parse(spark, [text], manual_kv_scrape_expr)
    m = out[0]
    assert m["quote_number"] == "WC-9"
    assert m["status"] == "partial"
    assert "null_field" not in m  # 'null' values skipped (gemini.py:281)
    # reference quirk reproduced exactly: '\s*' after 'empty_field:'
    # consumes the newline, so the bare-value pattern captures the NEXT
    # line as this field's value (verified against the Python original)
    assert m["empty_field"] == "null_field: null"


def test_no_json_yields_null(spark):
    # reference raises ExtractionError (gemini.py:255); we surface null
    out = _parse(spark, ["I'm sorry, I cannot process this document."])
    assert out[0] is None


def test_last_pattern_overwrites(spark):
    # pattern 2 re-matches quoted values (with quotes stripped) and the
    # reference's dict loop overwrites -> LAST_WIN map semantics
    out = _parse(spark, ['"field": "quoted value"'], manual_kv_scrape_expr)
    assert out[0]["field"] == "quoted value"


def test_udf_kernel_parity(spark):
    # the Arrow pandas_udf kernel must agree with the expression cascade
    # on the reference's response domain (flat string-valued objects +
    # the KV fallback shapes) — every case above, plus the gate query's
    # four variants
    from insurance_pdf_extractor_spark.functions.json_extract import parse_llm_response_udf

    texts = [
        'Here you go:\n```json\n{"quote_number": "WC-123", "premium": "$1,000"}\n```\ndone',
        '```\n{"a": "generic block"}\n```',
        'the JSON {"a": "keyword"} trailing',
        'prefix {"a": "bare"} suffix',
        '```json\n{not valid json}\n```\n{"a": "recovered"}',
        "```json\n{}\n```ok",
        'quote_number: "WC-9"\n"status": partial\nempty_field: \nnull_field: null',
        "I'm sorry, I cannot process this document.",
        '"field": "quoted value"',
        '```json\n{broken\n```\norder_key: "42"\npriority: "URGENT"',
        None,
    ]
    expr_out = _parse(spark, [t if t is not None else "" for t in texts])
    udf = parse_llm_response_udf()
    udf_out = _parse(spark, [t if t is not None else "" for t in texts], lambda c: udf(c))
    assert expr_out == udf_out

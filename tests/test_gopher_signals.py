"""Gopher §A1.1 filter signals on planted strings (the shared corpus
has no newlines/symbols, so the line- and symbol-based signals are
exercised here rather than in the gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.operators import text_quality as tq


def _vals(spark, texts, expr):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", expr(F.col("text")).alias("v")).orderBy("i").collect()
    return [r["v"] for r in rows]


def test_mean_word_len(spark):
    got = _vals(spark, ["aa bb cc", "abcd", "a  b", ""], tq.mean_word_len_expr)
    assert got == [2.0, 4.0, 1.0, 0.0]


def test_symbol_word_ratio(spark):
    got = _vals(
        spark,
        ["plain words here", "# tag ... more …", "## double"],
        tq.symbol_word_ratio_expr,
    )
    assert got[0] == 0.0
    assert got[1] == pytest.approx(0.6)   # '#', '...', '…' over 5 whitespace tokens
    assert got[2] == pytest.approx(1.0)   # '##' = two '#' over 2 words


def test_bullet_line_frac(spark):
    text = "- first\n* second\nplain\n• third"
    (got,) = _vals(spark, [text], tq.bullet_line_frac_expr)
    assert got == pytest.approx(0.75)
    (none,) = _vals(spark, ["no bullets at all"], tq.bullet_line_frac_expr)
    assert none == 0.0


def test_ellipsis_line_frac(spark):
    text = "ends here...\nnot this one\ntrails off…\nplain"
    (got,) = _vals(spark, [text], tq.ellipsis_line_frac_expr)
    assert got == pytest.approx(0.5)

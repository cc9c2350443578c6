"""Property-based parity: the Spark expression normalizers must agree
with the pure-Python oracle (which mirrors the reference's validators)
on arbitrary generated inputs — not just the hand-picked cases in
test_normalizers. One Spark job per property evaluates the whole batch
of generated examples at once.
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import oracle
from insurance_pdf_extractor_spark.functions import normalizers as N

# text that exercises the normalizers' edge cases: whitespace runs,
# bullets, currency junk, digits, date-ish separators
_ALPHABET = string.ascii_letters + string.digits + " \t$,.%/-·•()_'\""
texts = st.lists(st.text(alphabet=_ALPHABET, max_size=24), min_size=1, max_size=40)


def _spark_map(spark, vals, expr_builder, out_type="string"):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    rows = df.select("i", expr_builder(F.col("v")).cast(out_type).alias("o")).orderBy("i").collect()
    return [r["o"] for r in rows]


@settings(max_examples=20, deadline=None)
@given(texts)
def test_clean_text_parity(spark, vals):
    got = _spark_map(spark, vals, N.clean_text_expr)
    exp = [oracle.clean_text(v) for v in vals]
    assert got == exp


@settings(max_examples=20, deadline=None)
@given(texts)
def test_clean_currency_parity(spark, vals):
    got = _spark_map(spark, vals, N.clean_currency_expr, "double")
    exp = [oracle.clean_currency(v) for v in vals]
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g is not None and abs(g - e) < 1e-9


@settings(max_examples=20, deadline=None)
@given(texts)
def test_boolean_utils_parity(spark, vals):
    got = _spark_map(spark, vals, N.normalize_boolean_utils_expr)
    exp = [oracle.normalize_boolean_utils(v) for v in vals]
    assert got == exp


@settings(max_examples=20, deadline=None)
@given(texts)
def test_commission_parity(spark, vals):
    got = _spark_map(spark, vals, N.normalize_commission_expr)
    exp = [oracle.normalize_commission(v) for v in vals]
    assert got == exp


# date-shaped generator: real dates in the supported styles + garbage
_date_like = st.one_of(
    st.dates().map(lambda d: d.strftime("%m/%d/%Y")),
    st.dates().map(lambda d: d.strftime("%Y-%m-%d")),
    st.dates().map(lambda d: d.strftime("%m-%d-%Y")),
    st.dates().map(lambda d: d.strftime("%d/%m/%Y")),
    st.dates().map(lambda d: d.strftime("%B %d, %Y")),
    st.dates().map(lambda d: d.strftime("%b %d, %Y")),
    st.text(alphabet=string.digits + "/-., ", max_size=12),
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_date_like, min_size=1, max_size=40))
def test_date_normalize_parity(spark, vals):
    got = _spark_map(spark, vals, N.normalize_date_expr)
    exp = [oracle.normalize_date(v) for v in vals]
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(texts)
def test_boolean_model_parity(spark, vals):
    got = _spark_map(spark, vals, N.normalize_boolean_model_expr)
    exp = [oracle.normalize_boolean_model(v) for v in vals]
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(texts)
def test_quote_number_parity(spark, vals):
    got = _spark_map(spark, vals, N.validate_quote_number_expr, "boolean")
    exp = [oracle.validate_quote_number(v) for v in vals]
    assert got == exp


_statey = st.lists(
    st.one_of(
        st.sampled_from(["CA", "NY", "tx", "ZZ", "AL MS", "covered in CA and NY", "XCAX"]),
        st.text(alphabet=string.ascii_uppercase + " .,-", max_size=20),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=15, deadline=None)
@given(_statey)
def test_state_codes_parity(spark, vals):
    from insurance_pdf_extractor_spark.constants import US_STATES

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v string")
    rows = df.select("i", N.extract_state_codes_expr(F.col("v")).alias("o")).orderBy("i").collect()
    got = [list(r["o"]) for r in rows]
    exp = [oracle.extract_state_codes(v, set(US_STATES)) for v in vals]
    assert got == exp

"""Parity tests: each expression-compiled normalizer vs the pure-Python
oracle transcription of the reference's literal behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import oracle
from insurance_pdf_extractor_spark.constants import EMPTY_VALUE, US_STATES
from insurance_pdf_extractor_spark.functions import normalizers as N


def _run(spark, expr_builder, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(expr_builder(F.col("v")).alias("out")).collect()]


DATE_CASES = [
    "01/01/2024",          # already MM/DD/YYYY
    "2024-01-01",          # ISO (reference test case: → 01/01/2024)
    "01-05-2024",          # MM-DD-YYYY
    "25/12/2024",          # DD/MM (day>12 → only dd/MM parses)
    "05/03/2024",          # ambiguous → MM/dd wins
    "January 05, 2024",
    "Jan 05, 2024",
    "not a date",
    "13/45/20x9",
    EMPTY_VALUE,
    "",
    None,
]


def test_normalize_date_model_cascade(spark):
    got = _run(spark, N.normalize_date_expr, DATE_CASES)
    exp = [oracle.normalize_date(v, oracle.MODEL_DATE_FORMATS) if v else v for v in DATE_CASES]
    assert got == exp
    # the reference's own test case (tests/test_validation.py):
    assert oracle.normalize_date("2024-01-01") == "01/01/2024"
    assert got[1] == "01/01/2024"


def test_normalize_date_utils_cascade(spark):
    cases = DATE_CASES + ["20240101"]
    got = _run(spark, lambda c: N.normalize_date_expr(c, N.UTILS_SPARK_FORMATS), cases)
    exp = [oracle.normalize_date(v, oracle.UTILS_DATE_FORMATS) if v else v for v in cases]
    # NB: '%m/%d/%y' two-digit-year semantics differ between Python
    # (1969 pivot) and Spark ('yy' → 20yy); corpus avoids 2-digit years,
    # so only assert the formats both engines define identically.
    for g, e, v in zip(got, exp, cases):
        assert g == e, f"{v}: {g} != {e}"


def test_ambiguous_date_prefers_mmdd(spark):
    # 05/03/2024: strptime %m/%d/%Y succeeds first → May 3, not Mar 5
    assert oracle.normalize_date("05/03/2024") == "05/03/2024"
    got = _run(spark, N.normalize_date_expr, ["05/03/2024"])
    assert got == ["05/03/2024"]


CURRENCY_CASES = ["$1,234.56", "1234.56", "1,234", "$ 1 000", "abc", "$12x", EMPTY_VALUE, "", None]


def test_clean_currency(spark):
    got = _run(spark, N.clean_currency_expr, CURRENCY_CASES)
    exp = [oracle.clean_currency(v) if v is not None else None for v in CURRENCY_CASES]
    for g, e, v in zip(got, exp, CURRENCY_CASES):
        assert g == e or (g is not None and e is not None and abs(g - e) < 1e-9), f"{v}"


def test_validate_currency(spark):
    got = _run(spark, N.validate_currency_expr, CURRENCY_CASES)
    exp = [
        (oracle.clean_currency(v) is not None and oracle.clean_currency(v) >= 0)
        or (not v or v.upper() == EMPTY_VALUE)
        for v in CURRENCY_CASES[:-1]
    ] + [True]
    # None → emptyish → allowed
    for g, e, v in zip(got, exp, CURRENCY_CASES):
        assert bool(g) == bool(e), f"{v}: {g} != {e}"


TEXT_CASES = ["  hello   world  ", "·bullet• text", "a\t\nb", EMPTY_VALUE, "", None, "ok"]


def test_clean_text(spark):
    got = _run(spark, N.clean_text_expr, TEXT_CASES)
    exp = [oracle.clean_text(v) if v is not None else None for v in TEXT_CASES]
    assert got == exp


BOOL_CASES = [
    "Yes", "No", "True", "False", "Included", "Excluded",
    "yes", "no", "true", "false", "included", "excluded", "include", "exclude",
    "y", "n", "1", "0", "on", "off", "YES", "maybe", EMPTY_VALUE, "", None,
]


def test_boolean_utils_mapping(spark):
    got = _run(spark, N.normalize_boolean_utils_expr, BOOL_CASES)
    exp = [oracle.normalize_boolean_utils(v) if v is not None else None for v in BOOL_CASES]
    assert got == exp
    # wide mapping: 'y' → Included
    assert oracle.normalize_boolean_utils("y") == "Included"


def test_boolean_model_mapping(spark):
    got = _run(spark, N.normalize_boolean_model_expr, BOOL_CASES)
    exp = [oracle.normalize_boolean_model(v) if v is not None else None for v in BOOL_CASES]
    assert got == exp
    # model quirk: whitelisted 'Yes' passes through UNCHANGED
    assert oracle.normalize_boolean_model("Yes") == "Yes"
    # but lowercase 'yes' maps
    assert oracle.normalize_boolean_model("yes") == "Included"
    # 'y' is NOT in the model's map → unchanged
    assert oracle.normalize_boolean_model("y") == "y"


COMMISSION_CASES = ["10%", "$500", "12.5", "15", "0", "100", "101", "-5", "abc", EMPTY_VALUE, "", None]


def test_commission(spark):
    got = _run(spark, N.normalize_commission_expr, COMMISSION_CASES)
    exp = [oracle.normalize_commission(v) if v is not None else None for v in COMMISSION_CASES]
    assert got == exp
    assert oracle.normalize_commission("15") == "15.0%"


QUOTE_CASES = ["WC-TEST-123456", "ABC_1 (2)", "bad!", "", "   ", None, "Q#1"]


def test_quote_number(spark):
    got = _run(spark, N.validate_quote_number_expr, QUOTE_CASES)
    exp = [oracle.validate_quote_number(v) if v is not None else False for v in QUOTE_CASES]
    assert [bool(g) for g in got] == [bool(e) for e in exp]


STATE_CASES = [
    "123 Test Street, Test City, ST 12345",
    "TX - Hartford Casualty - CA and NY",
    "no states here",
    "lowercase tx stays invisible? TX!",
    "",
    None,
]


def test_state_codes(spark):
    got = _run(spark, N.extract_state_codes_expr, STATE_CASES)
    exp = [oracle.extract_state_codes(v, set(US_STATES)) if v else [] for v in STATE_CASES]
    for g, e, v in zip(got, exp, STATE_CASES):
        assert list(g or []) == e, f"{v}: {g} != {e}"


def test_date_format_predicate(spark):
    cases = ["01/01/2024", "1/1/2024", "2024-01-01", EMPTY_VALUE, "", None]
    got = _run(spark, N.validate_date_format_expr, cases)
    assert [bool(g) for g in got] == [True, False, False, True, True, True]


FNAME_CASES = ["a b/c.pdf", 'x<>:"|?*.pdf', "n" * 150 + ".pdf", "", None, "plain.pdf"]


def test_sanitize_filename(spark):
    import re

    def py_sanitize(filename):
        if not filename:
            return "unknown_file"
        s = re.sub(r'[<>:"/\\|?*]', "_", filename)
        s = re.sub(r"\s+", "_", s)
        if len(s) > 100:
            name, ext = s.rsplit(".", 1) if "." in s else (s, "")
            s = name[:90] + ("." + ext if ext else "")
        return s

    got = _run(spark, N.sanitize_filename_expr, FNAME_CASES)
    exp = [py_sanitize(v) for v in FNAME_CASES]
    assert got == exp


def test_estimate_cost_parity(spark):
    from insurance_pdf_extractor_spark.constants import MODEL_PRICING
    from insurance_pdf_extractor_spark.functions.confidence import estimated_cost_expr

    df = spark.createDataFrame([(1000, 2000), (123, 456), (0, 0)], "i long, o long")
    for model in ["gemini-1.5-flash", "gemini-2.5-pro", "unknown-model", "foo-gemini-1.5-pro-bar"]:
        got = [
            r["c"]
            for r in df.select(estimated_cost_expr(F.col("i"), F.col("o"), model).alias("c")).collect()
        ]
        exp = [
            oracle.estimate_cost(i, o, model, MODEL_PRICING)
            for i, o in [(1000, 2000), (123, 456), (0, 0)]
        ]
        assert got == pytest.approx(exp)


# --- PII redaction cascade (functions/pii.py, training-data op) -------------


def test_pii_redaction_categories(spark):
    from insurance_pdf_extractor_spark.functions.pii import pii_counts_expr, redact_pii_expr
    from pyspark.sql import functions as F

    rows = [
        (0, "mail bob.smith+x@corp.example.co.uk now"),
        (1, "cc 1234 5678 9012 3456 and 1234-5678-9012-3456"),
        (2, "ssn 987-65-4321 phone 415-555-1234 alt (212) 555-9876"),
        (3, "ip 8.8.8.8 and 255.255.255.255"),
        (4, "intl 25-989-741-2988 tpch-style"),
        (5, "clean text with numbers 1234567890123456 unseparated"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: r
        for r in df.select(
            "id",
            redact_pii_expr(F.col("text")).alias("red"),
            pii_counts_expr(F.col("text")).alias("c"),
        ).collect()
    }
    assert out[0].red == "mail <EMAIL> now" and out[0].c.email == 1
    assert out[1].red == "cc <CC> and <CC>" and out[1].c.cc == 2
    assert out[2].red == "ssn <SSN> phone <PHONE> alt <PHONE>"
    assert out[2].c.ssn == 1 and out[2].c.phone == 2
    assert out[3].red == "ip <IP> and <IP>" and out[3].c.ip == 2
    assert out[4].red == "intl <PHONE> tpch-style"
    # a bare 16-digit run is NOT a credit card (precision-first rule)
    assert out[5].red == rows[5][1]
    assert all(v == 0 for v in out[5].c.asDict().values())


def test_pii_cascade_no_double_count(spark):
    from insurance_pdf_extractor_spark.functions.pii import pii_counts_expr
    from pyspark.sql import functions as F

    # the cc must NOT additionally be counted as phones/ssn; the email's
    # host dots must not count as an ip
    df = spark.createDataFrame(
        [(0, "pay 1111 2222 3333 4444 or write a.b@c12.example.org")],
        "id long, text string",
    )
    c = df.select(pii_counts_expr(F.col("text")).alias("c")).first().c
    assert c.cc == 1 and c.email == 1
    assert c.phone == 0 and c.ssn == 0 and c.ip == 0

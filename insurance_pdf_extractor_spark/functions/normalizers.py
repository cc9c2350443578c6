"""Field normalizers compiled to pure Spark column expressions.

Each builder reproduces one reference normalizer exactly (cited), so
the whole field stage stays inside Catalyst whole-stage codegen — no
Python in the hot path (north rule) and every op is vectorized JVM-side.

Session-config independent: every parse uses ``try_to_date`` / guarded
casts, so failed parses yield null (the reference's lenient semantics)
under ANSI mode on or off — the driver's oracle harness runs a vanilla
Spark 4 session with ANSI enabled.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import BOOL_EXCLUDED, BOOL_INCLUDED, DATE_FORMATS, EMPTY_VALUE, US_STATES

DATE_RE = r"^\d{2}/\d{2}/\d{4}$"

# Model-validator cascade (app/models/extraction.py:144-151) — 6 formats.
MODEL_SPARK_FORMATS = [spark for _py, spark in DATE_FORMATS[:6]]
# utils.normalize_date cascade (app/utils/validators.py:69-78) — 8 formats.
UTILS_SPARK_FORMATS = [spark for _py, spark in DATE_FORMATS]


def _is_emptyish(col: Column) -> Column:
    return col.isNull() | (col == "") | (F.upper(col) == EMPTY_VALUE)


def python_strip_expr(col: Column) -> Column:
    """Python ``str.strip()`` equivalent — F.trim removes only spaces,
    not tabs/newlines (a measured parity gap vs the reference)."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


# Python float() literal grammar: optional sign; digit groups that may
# be separated by single underscores; optional fraction/exponent; or
# inf/infinity/nan (case-insensitive). Spark's string→double cast is
# BOTH looser ('0D', '1F' type suffixes parse) and stricter (no
# underscores), so a bare cast diverges from the reference's float().
_PY_FLOAT_FINITE = r"^[+-]?(\d(_?\d)*(\.(\d(_?\d)*)?)?|\.\d(_?\d)*)([eE][+-]?\d(_?\d)*)?$"


def python_float_expr(col: Column) -> Column:
    """float(col) with CPython semantics: double when parseable by
    Python's grammar, null otherwise."""
    neg = col.rlike(r"^\s*-")
    low = F.lower(python_strip_expr(col))
    return (
        F.when(low.rlike(r"^[+-]?inf(inity)?$"),
               F.when(neg, F.lit(float("-inf"))).otherwise(F.lit(float("inf"))))
        .when(low.rlike(r"^[+-]?nan$"), F.lit(float("nan")))
        .when(col.rlike(_PY_FLOAT_FINITE), F.regexp_replace(col, "_", "").cast("double"))
    )


def normalize_date_expr(col: Column, formats: list[str] | None = None) -> Column:
    """F3 — ordered strptime cascade reformatted to MM/dd/yyyy, original
    on failure (app/models/extraction.py:134-161 /
    app/utils/validators.py:52-89). Order is semantic: MM/dd wins over
    dd/MM for ambiguous dates."""
    formats = formats or MODEL_SPARK_FORMATS
    trimmed = python_strip_expr(col)
    cascade = F.coalesce(
        *[F.date_format(F.try_to_date(trimmed, fmt), "MM/dd/yyyy") for fmt in formats],
        trimmed,
    )
    return F.when(col.isNull() | (col == "") | (col == EMPTY_VALUE), col).otherwise(cascade)


def validate_date_format_expr(col: Column) -> Column:
    """F4 — MM/DD/YYYY regex; empty/sentinel passes
    (app/utils/validators.py:35-49)."""
    return _is_emptyish(col) | col.rlike(DATE_RE)


def clean_currency_expr(col: Column) -> Column:
    """F5 — strip [$,\\s], parse float, null on failure
    (app/utils/validators.py:13-32)."""
    cleaned = python_float_expr(F.regexp_replace(col, r"[$,\s]", ""))
    return F.when(_is_emptyish(col), F.lit(None).cast("double")).otherwise(cleaned)


def validate_currency_expr(col: Column) -> Column:
    """F6 — parseable and non-negative; empty/sentinel passes
    (app/utils/validators.py:237-256)."""
    parsed = clean_currency_expr(col)
    return _is_emptyish(col) | (parsed.isNotNull() & (parsed >= 0))


def clean_text_expr(col: Column) -> Column:
    """F9 — collapse whitespace, strip bullets, trim
    (app/utils/validators.py:92-112)."""
    step1 = F.regexp_replace(F.trim(col), r"\s+", " ")
    step2 = F.regexp_replace(step1, "[·•]", "")
    step3 = F.trim(F.regexp_replace(step2, r"\s+", " "))
    return F.when(_is_emptyish(col), col).otherwise(step3)


def normalize_boolean_utils_expr(col: Column) -> Column:
    """F7 (wide mapping) — app/utils/validators.py:134-159."""
    v = python_strip_expr(F.lower(col))
    return (
        F.when(_is_emptyish(col), col)
        .when(v.isin(BOOL_INCLUDED), "Included")
        .when(v.isin(BOOL_EXCLUDED), "Excluded")
        .otherwise(col)
    )


def normalize_boolean_model_expr(col: Column) -> Column:
    """F7 (model variant) — app/models/extraction.py:103-115: whitelisted
    values (incl. 'Yes'/'No'/'True'/'False') pass through unchanged;
    only other variants are case-folded and mapped."""
    whitelist = ["Included", "Excluded", "Yes", "No", "True", "False"]
    v = F.lower(col)
    mapped = (
        F.when(v.isin(["yes", "true", "included", "include"]), "Included")
        .when(v.isin(["no", "false", "excluded", "exclude"]), "Excluded")
        .otherwise(col)
    )
    return F.when(col.isNull() | (col == EMPTY_VALUE) | (col == ""), col).otherwise(
        F.when(col.isin(whitelist), col).otherwise(mapped)
    )


def normalize_commission_expr(col: Column) -> Column:
    """F8 — keep %/$ forms; bare 0-100 number gets '%' appended with
    Python float formatting ('15' → '15.0%')
    (app/models/extraction.py:117-132). The reference REBINDS v to the
    stripped value before its fallthrough `return v`, so unparseable
    non-empty input comes back stripped (property-tested vs the
    oracle)."""
    v = python_strip_expr(col)
    num = python_float_expr(v)
    return F.when(col.isNull() | (col == EMPTY_VALUE) | (col == ""), col).otherwise(
        F.when(v.contains("%") | v.contains("$"), v)
        .when(num.isNotNull() & (num >= 0) & (num <= 100), F.concat(num.cast("string"), F.lit("%")))
        .otherwise(v)
    )


def validate_quote_number_expr(col: Column) -> Column:
    """F10 — nonempty + charset check (app/utils/validators.py:115-131)."""
    t = python_strip_expr(col)
    return col.isNotNull() & (t != "") & t.rlike(r"^[A-Za-z0-9\-_\(\)\s]+$")


def extract_state_codes_expr(col: Column) -> Column:
    """F11 — \\b[A-Z]{2}\\b matches intersected with the 51-state
    whitelist, first-occurrence order preserved
    (app/utils/validators.py:162-234)."""
    matches = F.regexp_extract_all(F.upper(col), F.lit(r"\b([A-Z]{2})\b"), 1)
    return F.filter(matches, lambda s: s.isin(US_STATES))


def sanitize_filename_expr(col: Column) -> Column:
    """F18 — replace problematic chars and whitespace with '_'
    (app/utils/validators.py:259-281; length cap applied for names
    > 100 chars keeping the extension)."""
    s = F.regexp_replace(col, r'[<>:"/\\|?*]', "_")
    s = F.regexp_replace(s, r"\s+", "_")
    ext = F.regexp_extract(s, r"\.([^.]*)$", 1)
    name = F.regexp_replace(s, r"\.[^.]*$", "")
    capped = F.when(
        F.length(s) > 100,
        F.when(ext != "", F.concat(F.substring(name, 1, 90), F.lit("."), ext)).otherwise(
            F.substring(s, 1, 90)
        ),
    ).otherwise(s)
    return F.when(col.isNull() | (col == ""), "unknown_file").otherwise(capped)


def format_processing_time_expr(col: Column) -> Column:
    """F19 — ms/s/m humanization (app/utils/validators.py:284-301)."""
    return (
        F.when(col < 1, F.concat(F.round(col * 1000, 0).cast("int").cast("string"), F.lit("ms")))
        .when(col < 60, F.concat(F.format_number(col, 1), F.lit("s")))
        .otherwise(
            F.concat(
                F.floor(col / 60).cast("int").cast("string"),
                F.lit("m "),
                F.format_number(col % 60, 1),
                F.lit("s"),
            )
        )
    )

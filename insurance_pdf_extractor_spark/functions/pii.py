"""PII redaction for training-data curation: an ordered
``regexp_replace`` cascade over email / credit-card / SSN / phone /
IPv4 shapes, plus per-category match counts.

Pure column expressions — JVM-side, codegen'd, no Python in the hot
path; a 10^12-doc scrub is one map-only projection. The patterns are
deliberately ASCII-shape-based (the common production first pass —
cf. C4/Dolma-style rule filters), NOT an NER model: precision over
recall, deterministic, and expressible 1:1 in the DuckDB gate oracle
(Java regex and RE2 agree on this subset: no backreferences, no
lookaround, leftmost-first alternation).

Cascade order matters and is part of the contract: emails first (an
address can contain digit runs), then the longer digit shapes before
the shorter ones they contain (credit card 4-4-4-4, SSN 3-2-4, phone
shapes incl. TPC-H's 2-3-3-4, IPv4 last).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (category, pattern, replacement) in application order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\(\d{3}\)\s?\d{3}-\d{4}|\b\d{2}-\d{3}-\d{3}-\d{4}\b|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii_expr(col: Column) -> Column:
    """Text with every PII match replaced by its ``<CATEGORY>`` token."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts_expr(col: Column) -> Column:
    """Struct of per-category match counts (email, cc, ssn, phone, ip).

    Counts are taken on the PROGRESSIVELY redacted text, mirroring the
    cascade: a credit card number is not double-counted as two phone
    numbers, exactly as :func:`redact_pii_expr` would only replace it
    once."""
    fields = []
    cur = col
    for name, pattern, token in PII_PATTERNS:
        fields.append(F.size(F.regexp_extract_all(cur, F.lit(pattern), 0)).alias(name))
        cur = F.regexp_replace(cur, pattern, token)
    return F.struct(*fields)


def pii_redact_sql(col_sql: str) -> str:
    """The identical cascade as DuckDB SQL over ``col_sql`` (for gate
    oracles). Single quotes in patterns would need escaping; none of
    the shipped patterns contain any."""
    out = col_sql
    for _, pattern, token in PII_PATTERNS:
        # DuckDB single-quoted strings pass backslashes through
        # literally, so the Java-regex pattern text is valid verbatim.
        out = f"regexp_replace({out}, '{pattern}', '{token}', 'g')"
    return out

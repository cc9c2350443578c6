"""F1/F2 — LLM-response JSON extraction as pure column expressions.

Reproduces the reference's two-stage response parser
(app/services/gemini.py:197-284):

- F1 ``extract_json_cascade_expr``: four regex strategies tried in
  order (```json block, generic ``` block, ``json{...}`` keyword, bare
  ``{...}``), DOTALL + case-insensitive, first strategy whose first
  match parses to a non-empty JSON object wins (gemini.py:213-233).
  Parsing uses ``from_json`` with a string map schema — null on
  malformed input, exactly the "try next strategy" behavior.
- F2 ``manual_kv_scrape_expr``: fallback key-value scrape with the
  reference's two patterns (``"field": "value"`` then ``"field":
  value``), later pattern overwriting earlier entries the way the
  reference's dict assignment does (gemini.py:268-282). Last-win
  semantics are encoded in the expression itself (reverse + keep first
  occurrence per key) — no dependence on ``spark.sql.mapKeyDedupPolicy``,
  so the expressions run identically on a vanilla session (the driver's
  oracle harness uses the default EXCEPTION policy).

Everything stays inside Catalyst — no UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MAP_SCHEMA = "map<string,string>"

# Reference strategy patterns (gemini.py:213-218) with inline DOTALL +
# case-insensitive flags; Java regex accepts (?is).
JSON_PATTERNS = [
    r"(?is)```json\s*(\{.*?\})\s*```",  # JSON code block
    r"(?is)```\s*(\{.*?\})\s*```",  # generic code block
    r"(?is)json\s*(\{.*?\})",  # json keyword
    r"(?is)(\{.*?\})",  # any JSON-like structure
]


def _strategy_expr(col: Column, pattern: str) -> Column:
    """One cascade strategy: ALL regex matches tried in order
    (re.findall loop, gemini.py:220-233); the first that parses to a
    NON-EMPTY object wins, else null."""
    parsed = F.transform(
        F.regexp_extract_all(col, F.lit(pattern), 1),
        lambda m: F.from_json(F.trim(m), MAP_SCHEMA),
    )
    valid = F.filter(parsed, lambda p: p.isNotNull() & (F.size(F.map_keys(p)) > 0))
    return F.when(F.size(valid) > 0, F.element_at(valid, 1))


def extract_json_cascade_expr(col: Column) -> Column:
    """F1 — first-winning-strategy JSON object as map<string,string>.
    Null when every strategy fails (caller falls back to F2)."""
    return F.coalesce(*[_strategy_expr(col, p) for p in JSON_PATTERNS])


def first_win_entries(entries: Column) -> Column:
    """Drop every entry whose key already appeared earlier in the array,
    so ``map_from_entries`` sees unique keys regardless of the session's
    ``spark.sql.mapKeyDedupPolicy``. O(n²) per row but the entry arrays
    here are tiny (scraped labels / KV matches), and it stays fully
    JVM-side."""
    keys = F.transform(entries, lambda e: e["key"])
    return F.filter(
        entries,
        lambda e, i: ~F.exists(F.slice(keys, F.lit(1), i), lambda k: k == e["key"]),
    )


_KV_QUOTED = r'"?([a-zA-Z_]+)"?\s*:\s*"([^"]*)"'
_KV_BARE = r'"?([a-zA-Z_]+)"?\s*:\s*([^,\n}]+)'


def _kv_entries_expr(col: Column, pattern: str) -> Column:
    """Aligned (key, value) entries for one scrape pattern; values get
    the reference's strip-quotes cleanup, empty/'null' dropped
    (gemini.py:276-282)."""
    keys = F.regexp_extract_all(col, F.lit(pattern), 1)
    vals = F.regexp_extract_all(col, F.lit(pattern), 2)
    entries = F.arrays_zip(
        F.transform(keys, lambda k: F.lower(F.trim(k))).alias("key"),
        F.transform(
            vals,
            lambda v: F.regexp_replace(F.regexp_replace(F.trim(v), '^"|"$', ""), r"^'|'$", ""),
        ).alias("value"),
    )
    return F.filter(entries, lambda e: (e["value"] != "") & (e["value"] != "null"))


def manual_kv_scrape_expr(col: Column) -> Column:
    """F2 — fallback key-value scrape to map<string,string>; null when
    nothing matched (reference returns None, gemini.py:284)."""
    merged = F.concat(_kv_entries_expr(col, _KV_QUOTED), _kv_entries_expr(col, _KV_BARE))
    # last-win like the reference's dict loop: reverse, keep the first
    # occurrence per key — dedup is in the plan, not the session config
    m = F.map_from_entries(first_win_entries(F.reverse(merged)))
    return F.when(F.size(merged) > 0, m)


def parse_llm_response_expr(col: Column) -> Column:
    """Full F1→F2 parse: cascade, then manual scrape; null = the
    reference's ExtractionError path (gemini.py:253-258)."""
    return F.coalesce(extract_json_cascade_expr(col), manual_kv_scrape_expr(col))


def parse_llm_response_udf():
    """Arrow-batched kernel form of :func:`parse_llm_response_expr` —
    the reference's own re.findall + json.loads loop (gemini.py:213-284)
    over pandas batches.

    Exists because the expression form leans on higher-order functions
    (``transform``/``filter``/``exists``) which Catalyst interprets per
    element (the repo's measured rule, operators/dedup.py:4-7); this
    kernel crosses Arrow once per batch and runs C-level regex.

    Output parity with the expression form holds on flat JSON objects
    with string values (the reference's response shape, and the gate
    query's domain — verified by tests/test_json_extract.py). Known
    divergences outside that domain, documented rather than hidden:
    non-string JSON values stringify as Python ``str(v)`` ("1.5",
    "True") while ``from_json`` keeps the raw token ("1.50", "true");
    nested-object values stringify as Python dicts instead of raw JSON
    text.
    """
    import json as _json
    import re as _re

    from pyspark.sql.functions import pandas_udf

    pats = [_re.compile(p.replace("(?is)", ""), _re.I | _re.S) for p in JSON_PATTERNS]
    kv_pats = [_re.compile(_KV_QUOTED), _re.compile(_KV_BARE)]
    strip_dq = _re.compile(r'^"|"$')
    strip_sq = _re.compile(r"^'|'$")

    def _parse_one(s):
        if s is None:
            return None
        for p in pats:
            for m in p.findall(s):
                try:
                    obj = _json.loads(m.strip())
                except ValueError:
                    continue
                if isinstance(obj, dict) and obj:
                    return {str(k): (None if v is None else str(v)) for k, v in obj.items()}
        out: dict[str, str] = {}
        for rex in kv_pats:  # later pattern overwrites: reference dict loop
            for k, v in rex.findall(s):
                v = strip_sq.sub("", strip_dq.sub("", v.strip()))
                if v and v != "null":
                    out[k.lower().strip()] = v
        return out or None

    @pandas_udf("map<string,string>")
    def _parse(col: pd.Series) -> pd.Series:
        return col.map(_parse_one)

    return _parse

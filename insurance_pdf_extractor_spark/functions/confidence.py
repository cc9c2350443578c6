"""Confidence scoring (F14), token counting, and cost estimation (F15)
as pure column expressions.

- Confidence heuristic mirrors app/services/pdf_processor.py:403-445
  exactly: 0.0 for sentinel; base 0.5; +0.2 len>5; +0.2 value appears in
  response text (here: the document text — the deterministic stand-in
  for the LLM response); −0.1 len<3; +0.1 reliable fields; +0.1 date
  containing '/'; clamped to [0,1].
- Cost mirrors app/services/pdf_processor.py:249-299 with the pricing
  table from constants; token counts are deterministic stand-ins
  (whitespace tokens for input, serialized-record length/4 for output).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import DEFAULT_MODEL, EMPTY_VALUE, FIELD_NAMES, MODEL_PRICING


def _score_expr(field: str, value: Column, response_text: Column) -> Column:
    sval = value.cast("string")
    empty = sval.isNull() | (sval == EMPTY_VALUE) | (sval == "[]")
    score = F.lit(0.5)
    score = score + F.when(F.length(sval) > 5, 0.2).otherwise(0.0)
    score = score + F.when(F.instr(response_text, sval) > 0, 0.2).otherwise(0.0)
    score = score - F.when(F.length(sval) < 3, 0.1).otherwise(0.0)
    if field in ("quote_number", "named_insured_name"):
        score = score + 0.1
    if field.endswith("_date"):
        score = score + F.when(sval.contains("/"), 0.1).otherwise(0.0)
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), score))
    return F.when(empty, 0.0).otherwise(clamped)


def confidence_map_expr(response_text: Column) -> Column:
    """map<field, score> over the 18 record columns
    (app/services/pdf_processor.py:403-445)."""
    entries = []
    for f in FIELD_NAMES:
        col = F.col(f)
        if f == "issuing_carrier":
            # list value stringifies like Python's str(list) for the
            # containment check; single-element lists dominate
            sval = F.when(F.size(col) == 0, F.lit(EMPTY_VALUE)).otherwise(
                F.concat(F.lit("['"), F.array_join(col, "', '"), F.lit("']"))
            )
            entries.append(F.lit(f))
            entries.append(_score_expr(f, sval, response_text))
        else:
            entries.append(F.lit(f))
            entries.append(_score_expr(f, col, response_text))
    return F.create_map(*entries)


def token_count_expr(text: Column) -> Column:
    """Deterministic input-token stand-in: whitespace token count."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.size(F.split(text, r"\s+"))
    ).cast("long")


def estimated_cost_expr(
    input_tokens: str | Column, output_tokens: str | Column, model_name: str = DEFAULT_MODEL
) -> Column:
    """F15 — per-model $/1k pricing, partial-name match with
    gemini-1.5-flash fallback, round 6
    (app/services/pdf_processor.py:249-299)."""
    base = model_name
    if base not in MODEL_PRICING:
        for key in MODEL_PRICING:
            if key in model_name:
                base = key
                break
        else:
            base = DEFAULT_MODEL
    p = MODEL_PRICING[base]
    in_c = F.col(input_tokens) if isinstance(input_tokens, str) else input_tokens
    out_c = F.col(output_tokens) if isinstance(output_tokens, str) else output_tokens
    # bround = HALF_EVEN, matching Python round()'s banker's rounding
    # (F.round is HALF_UP; diverges on exact .5 decimals, e.g. 314
    # input tokens at $0.00125/1k -> 0.0003925)
    return F.bround(in_c / 1000 * p["input"] + out_c / 1000 * p["output"], 6)


def cost_breakdown_expr(
    input_tokens: Column, output_tokens: Column, model_name: str = DEFAULT_MODEL
) -> Column:
    """F16 — detailed struct incl. formatted string
    (app/services/pdf_processor.py:301-341)."""
    base = model_name if model_name in MODEL_PRICING else DEFAULT_MODEL
    p = MODEL_PRICING[base]
    in_cost = F.bround(input_tokens / 1000 * p["input"], 6)
    out_cost = F.bround(output_tokens / 1000 * p["output"], 6)
    total = F.bround(in_cost + out_cost, 6)
    return F.struct(
        F.lit(base).alias("model_used"),
        input_tokens.alias("input_tokens"),
        output_tokens.alias("output_tokens"),
        (input_tokens + output_tokens).alias("total_tokens"),
        in_cost.alias("input_cost"),
        out_cost.alias("output_cost"),
        total.alias("total_cost"),
        F.format_string("$%s (input) + $%s (output) = $%s", in_cost, out_cost, total).alias(
            "cost_breakdown"
        ),
    )

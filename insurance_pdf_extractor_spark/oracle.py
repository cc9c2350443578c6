"""Single-threaded pure-Python oracle for the extraction semantics.

Transcribes the reference's behavior (cited per function) so tests can
check the Spark pipeline's output against an independent
implementation. This module never touches Spark.
"""

from __future__ import annotations

import re
from datetime import datetime

from .constants import (
    BOILERPLATE_MIN_FRAC,
    BOILERPLATE_MIN_PAGES,
    EMPTY_VALUE,
    FIELD_NAMES,
    VALIDATION_FAILED,
)

# ---------------------------------------------------------------------------
# Normalizers (reference: app/models/extraction.py, app/utils/validators.py)
# ---------------------------------------------------------------------------

# Model-validator format list (app/models/extraction.py:144-151) — note it
# is SHORTER than utils.normalize_date's (no %m/%d/%y, no %Y%m%d).
MODEL_DATE_FORMATS = ["%m/%d/%Y", "%m-%d-%Y", "%Y-%m-%d", "%d/%m/%Y", "%B %d, %Y", "%b %d, %Y"]
UTILS_DATE_FORMATS = MODEL_DATE_FORMATS + ["%m/%d/%y", "%Y%m%d"]
DATE_RE = re.compile(r"^\d{2}/\d{2}/\d{4}$")


def normalize_date(date_str: str, formats: list[str] = MODEL_DATE_FORMATS) -> str:
    """app/models/extraction.py:134-161 / app/utils/validators.py:52-89."""
    if not date_str or date_str == EMPTY_VALUE:
        return date_str
    date_str = date_str.strip()
    for fmt in formats:
        try:
            return datetime.strptime(date_str, fmt).strftime("%m/%d/%Y")
        except ValueError:
            continue
    return date_str


def clean_currency(value: str) -> float | None:
    """app/utils/validators.py:13-32."""
    if not value or value.upper() == EMPTY_VALUE:
        return None
    try:
        return float(re.sub(r"[$,\s]", "", str(value)))
    except (ValueError, TypeError):
        return None


def clean_text(value: str) -> str:
    """app/utils/validators.py:92-112."""
    if not value or value.upper() == EMPTY_VALUE:
        return value
    cleaned = re.sub(r"\s+", " ", str(value).strip())
    cleaned = re.sub(r"[·•]", "", cleaned)
    cleaned = re.sub(r"\s+", " ", cleaned)
    return cleaned.strip()


def normalize_boolean_utils(value: str) -> str:
    """app/utils/validators.py:134-159 (wide mapping incl. y/n/1/0/on/off)."""
    if not value or value.upper() == EMPTY_VALUE:
        return value
    v = str(value).lower().strip()
    if v in ["yes", "true", "included", "include", "y", "1", "on"]:
        return "Included"
    if v in ["no", "false", "excluded", "exclude", "n", "0", "off"]:
        return "Excluded"
    return value


def normalize_boolean_model(value: str) -> str:
    """app/models/extraction.py:103-115 — note: values already in the
    whitelist (incl. 'Yes'/'No'/'True'/'False') pass through UNCHANGED;
    only non-whitelisted variants are case-folded and mapped."""
    if value and value != EMPTY_VALUE:
        if value not in ["Included", "Excluded", "Yes", "No", "True", "False"]:
            v_lower = value.lower()
            if v_lower in ["yes", "true", "included", "include"]:
                return "Included"
            if v_lower in ["no", "false", "excluded", "exclude"]:
                return "Excluded"
    return value


def normalize_commission(value: str) -> str:
    """app/models/extraction.py:117-132."""
    if value and value != EMPTY_VALUE:
        value = value.strip()
        if "%" in value or "$" in value:
            return value
        try:
            num = float(value)
            if 0 <= num <= 100:
                return f"{num}%"
        except ValueError:
            pass
    return value


def validate_quote_number(v: str) -> bool:
    """app/utils/validators.py:115-131."""
    if not v or len(v.strip()) == 0:
        return False
    return bool(re.match(r"^[A-Za-z0-9\-_\(\)\s]+$", v.strip()))


def extract_state_codes(text: str, states: set[str]) -> list[str]:
    """app/utils/validators.py:162-234."""
    if not text:
        return []
    return [s for s in re.findall(r"\b[A-Z]{2}\b", text.upper()) if s in states]


# ---------------------------------------------------------------------------
# Record validation (app/models/extraction.py:183-233 semantics)
# ---------------------------------------------------------------------------

POISONED_RECORD = {
    **{name: EMPTY_VALUE for name in FIELD_NAMES},
    "quote_number": VALIDATION_FAILED,
    "named_insured_name": VALIDATION_FAILED,
    "named_insured_address": VALIDATION_FAILED,
    "issuing_carrier": [],
}


def validate_record(raw: dict) -> tuple[dict, list[str], list[str]]:
    """Apply the model's field validators in order; any error poisons the
    record (the reference's partial path re-raises and falls back to the
    VALIDATION_FAILED model, app/models/extraction.py:212-232).

    Returns (record, validation_errors, warnings). ``issuing_carrier``
    is normalized to list[str].
    """
    errors: list[str] = []
    warnings: list[str] = []
    rec: dict = {}
    for name in FIELD_NAMES:
        v = raw.get(name)
        if v is None:
            v = EMPTY_VALUE if name != "issuing_carrier" else []
        rec[name] = v

    def err(field: str, msg: str) -> None:
        errors.append(f"Data validation failed: {field}: {msg}")

    # quote_number: required nonempty (extraction.py:60-65); a missing
    # key is also an error (pydantic required field, extraction.py:15)
    qn_raw = raw.get("quote_number")
    if qn_raw is None or not str(qn_raw).strip():
        err("quote_number", "Quote number cannot be empty")
    else:
        rec["quote_number"] = str(qn_raw).strip()

    # dates (extraction.py:48-58)
    for f in ("policy_effective_date", "policy_expiration_date"):
        v = rec[f]
        if v and v != EMPTY_VALUE:
            if not DATE_RE.match(v):
                v = normalize_date(v)
                if not DATE_RE.match(v):
                    err(f, f"Date must be in MM/DD/YYYY format, got: {v}")
            rec[f] = v

    # required name/address (extraction.py:67-72)
    for f in ("named_insured_name", "named_insured_address"):
        v = raw.get(f)
        if not v or not str(v).strip():
            err(f, "This field is required and cannot be empty")
        else:
            rec[f] = str(v).strip()

    # currency + limit validators are passthrough (extraction.py:74-101 —
    # the negative-limit raise is swallowed by its own except).

    # booleans (extraction.py:103-115)
    for f in ("tria", "waiver_of_subrogation_type"):
        rec[f] = normalize_boolean_model(rec[f])

    rec["commission"] = normalize_commission(rec["commission"])

    if isinstance(rec["issuing_carrier"], str):
        rec["issuing_carrier"] = [rec["issuing_carrier"]] if rec["issuing_carrier"] != EMPTY_VALUE else []

    if errors:
        return dict(POISONED_RECORD), errors, warnings

    # date-relationship warning (extraction.py:195-206)
    eff, exp = rec["policy_effective_date"], rec["policy_expiration_date"]
    if eff != EMPTY_VALUE and exp != EMPTY_VALUE and eff and exp:
        try:
            d_eff = datetime.strptime(eff, "%m/%d/%Y")
            d_exp = datetime.strptime(exp, "%m/%d/%Y")
            if d_eff >= d_exp:
                warnings.append("Policy effective date should be before expiration date")
        except ValueError:
            warnings.append("Could not validate date relationship due to invalid date format")

    return rec, errors, warnings


# ---------------------------------------------------------------------------
# Boilerplate rule (north_star: repeated-line frequency per doc_id group)
# ---------------------------------------------------------------------------

_NORM_WS = re.compile(r"\s+")


_NORM_DIGIT_TBL = str.maketrans("0123456789", "0000000000")


def normalize_line(line: str) -> str:
    """Boilerplate key: lowercase, ASCII digits→'0', collapsed
    whitespace, so 'Page 1 of 3' and 'Page 2 of 3' count as the same
    repeated line (same rule as operators/boilerplate.norm_key and the
    shard-merge replica: only ASCII digits fold)."""
    return _NORM_WS.sub(" ", line.lower().translate(_NORM_DIGIT_TBL)).strip()


def boilerplate_keys(pages: list[list[str]]) -> set[str]:
    """Normalized lines appearing on >= BOILERPLATE_MIN_FRAC of pages of
    a document with >= BOILERPLATE_MIN_PAGES pages."""
    n_pages = len(pages)
    if n_pages < BOILERPLATE_MIN_PAGES:
        return set()
    page_count: dict[str, int] = {}
    for page in pages:
        for key in {normalize_line(ln) for ln in page}:
            page_count[key] = page_count.get(key, 0) + 1
    return {k for k, c in page_count.items() if c / n_pages >= BOILERPLATE_MIN_FRAC}


# ---------------------------------------------------------------------------
# Confidence scoring (app/services/pdf_processor.py:403-445)
# ---------------------------------------------------------------------------


def confidence_scores(record: dict, response_text: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for field, value in record.items():
        if value == EMPTY_VALUE or value == [] or value is None:
            out[field] = 0.0
            continue
        sval = str(value)
        score = 0.5
        if len(sval) > 5:
            score += 0.2
        if sval in response_text:
            score += 0.2
        if len(sval) < 3:
            score -= 0.1
        if field in ("quote_number", "named_insured_name"):
            score += 0.1
        if field.endswith("_date") and "/" in sval:
            score += 0.1
        out[field] = min(1.0, max(0.0, score))
    return out


def estimate_cost(input_tokens: int, output_tokens: int, model_name: str, pricing: dict) -> float:
    """app/services/pdf_processor.py:249-299."""
    base = model_name
    if base not in pricing:
        for key in pricing:
            if key in model_name:
                base = key
                break
        else:
            base = "gemini-1.5-flash"
    p = pricing[base]
    return round((input_tokens / 1000) * p["input"] + (output_tokens / 1000) * p["output"], 6)

"""Stage 1 — batched byte-stream tokenization of PDF-style content
streams into positioned text runs.

Replaces the reference's ``pypdf.PdfReader(...).pages[i].extract_text()``
(app/services/pdf_processor.py:364-375) with a from-scratch reader of
the text-object operator subset (PDF 32000-1:2008 §9.4): ``BT/ET``
blocks, ``Tf`` font selection, ``Td/TD/Tm/T*`` positioning, and
``Tj/TJ/'`` string-showing operators, plus ``%%PAGE n`` page markers.

Every run records the byte offset of its string object in the source —
offsets are the authoritative, data-derived ordering key, so results
are invariant across partitioning/parallelism (north rule).

Exposed as a scalar ``pandas_udf`` over Arrow batches (no per-row
Python at the Spark API level).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import RUN

_STR_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f", "(": "(", ")": ")", "\\": "\\"}

_WS = " \t\r\n\f\x00"
_DELIM = "()<>[]{}/%"


def tokenize_content(content: bytes) -> list[tuple[int, float, float, int, str]]:
    """Parse one content stream. Returns runs as
    (page, x, y, byte_offset, text) tuples."""
    if not content:
        return []
    text = content.decode("latin-1")
    n = len(text)
    i = 0
    page = 0
    lm_x = lm_y = 0.0      # text-line matrix origin (e, f components)
    leading = 0.0
    stack: list = []       # operands: floats, ('s', off, str), ('a', off, [items])
    runs: list[tuple[int, float, float, int, str]] = []
    array_marks: list[int] = []

    def parse_string(start: int) -> tuple[int, str]:
        # start points at '('; PDF literal string with escapes and
        # balanced nested parens (§7.3.4.2)
        j = start + 1
        depth = 1
        out: list[str] = []
        while j < n and depth > 0:
            c = text[j]
            if c == "\\" and j + 1 < n:
                nxt = text[j + 1]
                if nxt in _STR_ESCAPES:
                    out.append(_STR_ESCAPES[nxt])
                    j += 2
                elif nxt.isdigit():  # octal \ddd (1-3 digits)
                    k = j + 1
                    digits = ""
                    while k < n and text[k].isdigit() and len(digits) < 3:
                        digits += text[k]
                        k += 1
                    out.append(chr(int(digits, 8) & 0xFF))
                    j = k
                else:
                    out.append(nxt)
                    j += 2
            elif c == "(":
                depth += 1
                out.append(c)
                j += 1
            elif c == ")":
                depth -= 1
                if depth > 0:
                    out.append(c)
                j += 1
            else:
                out.append(c)
                j += 1
        s = "".join(out)
        # the scan is byte-transparent (latin-1) so offsets stay exact;
        # recover multi-byte UTF-8 text here
        try:
            s = s.encode("latin-1").decode("utf-8")
        except (UnicodeDecodeError, UnicodeEncodeError):
            pass
        return j, s

    while i < n:
        c = text[i]
        if c in _WS:
            i += 1
            continue
        if c == "%":
            eol = i
            while eol < n and text[eol] not in "\r\n":
                eol += 1
            comment = text[i:eol]
            if comment.startswith("%%PAGE"):
                rest = comment[6:].strip()
                page = int(rest) if rest.lstrip("-").isdigit() else page + 1
            i = eol
            continue
        if c == "(":
            off = i
            i, s = parse_string(i)
            stack.append(("s", off, s))
            continue
        if c == "[":
            array_marks.append(len(stack))
            stack.append(("mark", i, None))
            i += 1
            continue
        if c == "]":
            if array_marks:
                m = array_marks.pop()
                items = stack[m + 1 :]
                off = stack[m][1]
                del stack[m:]
                stack.append(("a", off, items))
            i += 1
            continue
        if c == "/":
            j = i + 1
            while j < n and text[j] not in _WS and text[j] not in _DELIM:
                j += 1
            stack.append(("n", i, text[i:j]))
            i = j
            continue
        if c in "+-.0123456789":
            j = i
            while j < n and (text[j].isdigit() or text[j] in "+-."):
                j += 1
            try:
                stack.append(float(text[i:j]))
            except ValueError:
                pass
            i = j
            continue
        # operator keyword
        j = i
        while j < n and text[j] not in _WS and text[j] not in _DELIM:
            j += 1
        op = text[i:j]
        i = j
        if op == "BT":
            lm_x = lm_y = 0.0
            leading = 0.0
            stack.clear()
        elif op == "ET":
            stack.clear()
        elif op == "Td" or op == "TD":
            if len(stack) >= 2 and isinstance(stack[-1], float) and isinstance(stack[-2], float):
                ty, tx = stack[-1], stack[-2]
                lm_x += tx
                lm_y += ty
                if op == "TD":
                    leading = -ty
            stack.clear()
        elif op == "Tm":
            if len(stack) >= 6 and all(isinstance(v, float) for v in stack[-6:]):
                lm_x, lm_y = stack[-2], stack[-1]
            stack.clear()
        elif op == "T*":
            lm_y -= leading
            stack.clear()
        elif op == "TL":
            if stack and isinstance(stack[-1], float):
                leading = stack[-1]
            stack.clear()
        elif op == "Tj" or op == "'":
            if op == "'":
                lm_y -= leading
            if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "s":
                _, off, s = stack[-1]
                runs.append((page, lm_x, lm_y, off, s))
            stack.clear()
        elif op == "TJ":
            if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "a":
                _, off, items = stack[-1]
                s = "".join(it[2] for it in items if isinstance(it, tuple) and it[0] == "s")
                if s:
                    runs.append((page, lm_x, lm_y, off, s))
            stack.clear()
        else:
            # unknown operator (Tf, Tc, Tw, gs, ...) — consume operands
            stack.clear()
    return runs


def count_pages(content: bytes) -> int:
    return content.count(b"%%PAGE") if content else 0


@F.pandas_udf(T.ArrayType(RUN))
def tokenize_content_streams(content: pd.Series) -> pd.Series:
    """Vectorized Stage-1 kernel: binary content → array of text runs."""
    return content.map(lambda b: [] if b is None else tokenize_content(bytes(b)))

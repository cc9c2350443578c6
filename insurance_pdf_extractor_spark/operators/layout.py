"""Stage 2 — layout-block reconstruction: positioned text runs →
reading-order lines.

Replaces the implicit page→text ordering pypdf gives the reference
(app/services/pdf_processor.py:364-375) with explicit, deterministic
clustering: runs whose baseline y falls in the same ``Y_BIN_PT`` bin on
the same page form one visual line; lines read top-to-bottom
(y descending) per page; runs within a line read left-to-right
(x ascending, byte offset as tie-break). All keys derive from document
content, never from task/partition order (north rule: parallelism-
invariant output).
"""

from __future__ import annotations

import math

from ..constants import Y_BIN_PT


def layout_lines(
    runs: list[tuple[int, float, float, int, str]],
) -> list[tuple[int, int, str]]:
    """Cluster runs into reading-order lines.

    Args:
        runs: (page, x, y, byte_offset, text) tuples from Stage 1.

    Returns:
        Ordered list of (page, line_offset, line_text); line_offset is
        the min byte offset of the line's runs (the interleave key).
    """
    if not runs:
        return []
    lines: dict[tuple[int, int], list[tuple[float, int, str]]] = {}
    for page, x, y, off, text in runs:
        key = (page, int(math.floor(y / Y_BIN_PT)))
        lines.setdefault(key, []).append((x, off, text))

    out: list[tuple[int, int, str]] = []
    for (page, ybin), members in sorted(lines.items(), key=lambda kv: (kv[0][0], -kv[0][1])):
        members.sort(key=lambda m: (m[0], m[1]))
        text = "".join(m[2] for m in members)
        off = min(m[1] for m in members)
        out.append((page, off, text))
    # top-to-bottom per page is the primary order; offset is carried for
    # the later media interleave sort
    return out

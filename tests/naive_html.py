"""Independent reference implementation of the HTML main-content
extraction SEMANTICS on top of stdlib ``html.parser.HTMLParser`` — a
completely different tokenizer (CPython's own, with its own attribute,
entity, comment, and raw-text handling) driving the same block model
and boilerplate heuristics. The differential test compares block TEXT
sequences and media-ref sequences (byte offsets are pinned separately
by the fixture geometry mirror, which HTMLParser cannot reproduce —
it reports line/column of decoded text, not byte positions).

Deliberate scope notes (kept in sync with operators/html.py):
- charset: the caller decodes bytes before feeding this parser.
- convert_charrefs=True → entities arrive decoded in handle_data,
  matching decode_entities for the supported subset.
"""

from __future__ import annotations

from html.parser import HTMLParser

from insurance_pdf_extractor_spark.operators.html import (
    BLOCK_TAGS,
    LINK_DENSITY_MAX,
    LINK_DENSITY_MIN_CHARS,
    MEDIA_SRC_TAGS,
    REPEAT_MIN,
    STRIP_CONTAINERS,
    detect_charset,
)
from insurance_pdf_extractor_spark.operators.boilerplate import norm_key

_RAW_SKIP = {"script", "style", "noscript", "template", "textarea", "title", "svg", "math"}


class _Ref(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.strip = 0
        self.anchor = 0
        self.raw = 0  # inside a raw-text element we must ignore
        self.parts: list[str] = []
        self.link_parts: list[str] = []
        self.blocks: list[tuple[str, int, int]] = []  # (text, link, total)
        self.media: list[str] = []

    def _flush(self) -> None:
        text = " ".join("".join(self.parts).split())
        if text:
            link = len(" ".join("".join(self.link_parts).split()))
            self.blocks.append((text, link, len(text)))
        self.parts = []
        self.link_parts = []

    # -- events ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self.raw:
            return
        if tag in _RAW_SKIP:
            self.raw += 1
            return
        if tag in BLOCK_TAGS or tag in STRIP_CONTAINERS or tag == "br":
            self._flush()
        if tag in STRIP_CONTAINERS:
            self.strip += 1
        elif tag == "a":
            self.anchor += 1
        elif tag in MEDIA_SRC_TAGS and self.strip == 0:
            src = dict(attrs).get("src")
            if src:
                self.media.append(src)

    def handle_startendtag(self, tag, attrs):
        if self.raw:
            return
        if tag in BLOCK_TAGS or tag in STRIP_CONTAINERS or tag == "br":
            self._flush()
        if tag in MEDIA_SRC_TAGS and self.strip == 0:
            src = dict(attrs).get("src")
            if src:
                self.media.append(src)

    def handle_endtag(self, tag):
        if self.raw:
            if tag in _RAW_SKIP:
                self.raw -= 1
            return
        if tag in BLOCK_TAGS or tag in STRIP_CONTAINERS:
            self._flush()
        if tag in STRIP_CONTAINERS:
            if self.strip > 0:
                self.strip -= 1
        elif tag == "a":
            if self.anchor > 0:
                self.anchor -= 1

    def handle_data(self, data):
        if self.raw or self.strip:
            return
        self.parts.append(data)
        if self.anchor:
            self.link_parts.append(data)


def naive_extract(content: bytes) -> tuple[list[str], list[str]]:
    """(block texts, media refs) after the three boilerplate
    heuristics — the reference result the engine must match."""
    p = _Ref()
    p.feed(content.decode(detect_charset(content), "replace"))
    p.close()
    p._flush()
    kept = [
        t
        for t, link, total in p.blocks
        if not (total < LINK_DENSITY_MIN_CHARS and total > 0 and link / total > LINK_DENSITY_MAX)
    ]
    keys = [norm_key(t) for t in kept]
    counts: dict[str, int] = {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
    return [t for t, k in zip(kept, keys) if counts[k] < REPEAT_MIN], p.media

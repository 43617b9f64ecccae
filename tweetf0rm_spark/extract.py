"""Deterministic HTML→text extraction + outlink extraction (FIXTURES.md §D).

This is the pinned spec behind the byte-identity invariant
(BASELINE.json:L15 "byte-identical extracted text per url"): pure
Python, stdlib ``html.parser`` only — no bs4/lxml whose version drift
would break byte-identity. Any change here is a golden-breaking event
by design.

Pinned rules:
- decode html bytes as UTF-8, errors=strict (corpus is generated valid)
- drop ``<script>``/``<style>`` subtrees entirely
- block-level tags (p, div, li, h1..h6, br, title) emit ``\\n`` at both
  the open and the close tag (br at open only — it is void)
- inline tags emit nothing
- collapse whitespace runs within a line to a single space
- strip leading/trailing whitespace per line; drop empty lines
- join lines with ``\\n``; no trailing newline

The reference never extracts HTML (tweetf0rm consumes Twitter-API JSON;
SURVEY.md §2.A note), so this spec is reference-free and frozen by the
golden traces under ``tests/golden/``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd

__all__ = [
    "extract_text", "extract_outlinks", "extract_both", "extract_text_pandas",
]

_BLOCK_TAGS = frozenset(
    ["p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "br", "title"]
)
_SKIP_TAGS = frozenset(["script", "style"])
_WS_RUN = re.compile(r"[ \t\r\f\v]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0
        self._links: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self._links.append(v)
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS and tag != "br":
            self._chunks.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._chunks.append(data)

    def result(self) -> str:
        raw = "".join(self._chunks)
        lines = []
        for line in raw.split("\n"):
            line = _WS_RUN.sub(" ", line).strip()
            if line:
                lines.append(line)
        return "\n".join(lines)


def extract_text(html: bytes | str | None) -> str | None:
    """Extract visible text per the pinned spec. Pure, deterministic."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="strict")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result()


def extract_outlinks(html: bytes | str | None) -> list[str]:
    """All ``<a href>`` values in document order (drives BFS tie-breaks)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="strict")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p._links


def extract_both(
    html: bytes | str | None,
) -> tuple[str | None, list[str] | None]:
    """Single-pass (text, outlinks) — the hot-path kernel. One
    ``HTMLParser`` walk per document instead of two; byte-identical to
    calling :func:`extract_text` and :func:`extract_outlinks`
    separately (same parser, same spec). Null html propagates as
    ``(None, None)`` — matching the previous ``na_action='ignore'``
    batch behavior where dead links carried null outlinks."""
    if html is None or (isinstance(html, float)):  # None or pandas NaN
        return None, None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="strict")
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.result(), p._links


def extract_text_pandas(html: pd.Series) -> pd.Series:
    """Arrow-batch wrapper for use inside mapInPandas (SURVEY.md §3.2)."""
    return html.map(extract_text, na_action="ignore")


def extract_batches(
    batches: Iterable[pd.DataFrame], html_col: str = "html"
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: adds ``text`` and ``outlinks`` columns in a
    single parser pass per document (see :func:`extract_both`)."""
    for pdf in batches:
        pairs = [extract_both(h) for h in pdf[html_col]]
        pdf = pdf.assign(
            text=[t for t, _ in pairs],
            outlinks=[ls for _, ls in pairs],
        )
        yield pdf

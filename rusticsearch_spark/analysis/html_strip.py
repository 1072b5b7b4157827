"""Deterministic HTML → text extraction.

The reference indexes pre-extracted strings; the north rule adds an
HTML-strip stage over the raw ``html`` binary column whose output must
be byte-identical per url across runs — it *defines* the ``text``
column of the webtext table.  Implemented on the stdlib
``html.parser`` (no external C deps in this environment), fully
deterministic:

* ``<script>``/``<style>``/``<template>`` contents dropped;
* character references decoded;
* block-level elements introduce line breaks;
* each line whitespace-collapsed and stripped; empty lines dropped;
* lines joined with ``"\\n"``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    "p div br h1 h2 h3 h4 h5 h6 li ul ol tr table section article header "
    "footer title blockquote pre hr nav aside main figure figcaption "
    "dd dt dl form fieldset address".split()
)
_SKIP_TAGS = frozenset({"script", "style", "template"})
_WS = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\x00")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self.parts.append("\x00")

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def html_to_text(html) -> str:
    """Extract text from HTML bytes/str.  Deterministic; bytes are
    decoded as UTF-8 with replacement (never raises)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # malformed markup: keep whatever was extracted
    # Block boundaries (\x00 markers) become newlines; source
    # whitespace inside a block collapses to single spaces.
    raw = "".join(parser.parts)
    lines = [_WS.sub(" ", line).strip() for line in raw.split("\x00")]
    return "\n".join(line for line in lines if line)

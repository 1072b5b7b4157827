"""Token filters: lowercase, ASCII folding, ngram.

The reference's ASCIIFoldingFilter
(/root/reference/src/analysis/filters/asciifolding.rs, backed by a
~2,400-line transcription of Lucene's character table) is
re-expressed here *algorithmically*: NFKD-decompose a character, strip
combining marks, and accept the result only when it is pure ASCII —
plus a small supplement table for characters with no decomposition
(Ø, Æ, ß, Đ, Þ, Ł, ...).  Characters whose decomposition does not
bottom out in ASCII (Greek, Cyrillic, kana with dakuten, CJK, ...)
are left untouched, which is exactly the Lucene/reference behavior
for non-Latin scripts (asciifolding.rs:69-83 golden: こんにちは
unchanged).  Parity is pinned by the ported goldens in
``tests/test_filters.py``.
"""

from __future__ import annotations

import unicodedata
from typing import List

from .ngram_generator import Edge, ngram_generate
from .tokenizers import Token

# Characters that do not NFKD-decompose to ASCII but that Lucene's
# ASCIIFoldingFilter maps anyway.
_SUPPLEMENT = {
    "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŋ": "n", "Ŋ": "N", "ſ": "s",
    "‘": "'", "’": "'", "‚": "'", "‛": "'",
    "“": '"', "”": '"', "„": '"',
    "–": "-", "—": "-", "−": "-",
}

_fold_cache: dict = {}


def _fold_char(ch: str) -> str:
    try:
        return _fold_cache[ch]
    except KeyError:
        pass
    if ch in _SUPPLEMENT:
        folded = _SUPPLEMENT[ch]
    else:
        decomp = unicodedata.normalize("NFKD", ch)
        base = "".join(
            _SUPPLEMENT.get(c, c) for c in decomp if not unicodedata.combining(c)
        )
        folded = base if base and base.isascii() else ch
    _fold_cache[ch] = folded
    return folded


def ascii_fold(text: str) -> str:
    """Fold Latin diacritics/ligatures to ASCII; other scripts untouched."""
    if text.isascii():
        return text
    return "".join(_fold_char(ch) for ch in text)


def lowercase_filter(tokens: List[Token]) -> List[Token]:
    """Unicode lowercase per token (filters/lowercase.rs:22-42)."""
    return [Token(t.term.lower(), t.position) for t in tokens]


def ascii_folding_filter(tokens: List[Token]) -> List[Token]:
    return [Token(ascii_fold(t.term), t.position) for t in tokens]


def ngram_filter(tokens: List[Token], min_size: int, max_size: int,
                 edge: Edge = Edge.NEITHER) -> List[Token]:
    """Per-token ngram expansion preserving the source token's position
    (filters/ngram.rs:33-60)."""
    out: List[Token] = []
    for t in tokens:
        for gram in ngram_generate(t.term, min_size, max_size, edge):
            out.append(Token(gram, t.position))
    return out

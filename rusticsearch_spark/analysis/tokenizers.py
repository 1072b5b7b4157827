"""Tokenizers.

``standard_tokenize`` implements UAX#29-style word segmentation with
1-based positions, matching the behavior of the reference's
StandardTokenizer (/root/reference/src/analysis/tokenizers/standard.rs:8-41,
which wraps the Rust ``unicode-segmentation`` crate's
``unicode_words``):

* runs of letters/digits/marks/underscore form one word, with
  apostrophe / period / comma / colon joining per the UAX#29
  MidLetter/MidNum rules (simplified: any of ``'’.,:`` sandwiched
  between word characters joins);
* Katakana chains into runs (with the prolonged-sound mark);
* Hiragana and Han (and other ideographic scripts) split one word per
  character;
* everything else (punctuation, whitespace, symbols) is dropped.

Parity with the reference is pinned by the ported goldens in
``tests/test_tokenizers.py`` (standard.rs:44-91).  The ASCII fast
path uses a stdlib-``re`` pattern (C-speed) that agrees with the
Unicode path on ASCII input.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

import regex  # third-party 'regex' module: \p{...}, \X, class ops


class Token(NamedTuple):
    term: str
    position: int  # 1-based, increments per word


# ASCII fast path (hot path for web text): word chars joined by
# mid-punctuation when flanked by word chars on both sides.
_ASCII_WORD = re.compile(r"[A-Za-z0-9_]+(?:['.,:][A-Za-z0-9_]+)*")

# Unicode path. (?V1) enables character-class set operations.
_CJK = r"\p{Script=Hiragana}\p{Script=Katakana}\p{Script=Han}"
_UNI_WORD = regex.compile(
    r"(?V1)"
    r"(?:[\p{Script=Katakana}ー]+)"          # katakana runs
    r"|(?:\p{Script=Hiragana})"                   # hiragana: per char
    r"|(?:\p{Script=Han})"                        # han: per char
    rf"|(?:[[\p{{L}}\p{{N}}\p{{M}}_]--[{_CJK}]]+"
    rf"(?:['’.,:][[\p{{L}}\p{{N}}\p{{M}}_]--[{_CJK}]]+)*)"
)


def standard_words(text: str) -> List[str]:
    """Word segments only (no positions)."""
    if text.isascii():
        return _ASCII_WORD.findall(text)
    return _UNI_WORD.findall(text)


def standard_tokenize(text: str) -> List[Token]:
    """UAX#29-ish words with 1-based positions (standard.rs:26-40)."""
    return [Token(w, i) for i, w in enumerate(standard_words(text), start=1)]


def ngram_tokenize(text: str, min_size: int, max_size: int,
                   edge: "Edge" = None) -> List[Token]:
    """Word-split then per-word ngram expansion; the position of every
    gram is the *word's* position
    (/root/reference/src/analysis/tokenizers/ngram.rs:8-61).
    """
    from .ngram_generator import Edge, ngram_generate
    if edge is None:
        edge = Edge.NEITHER
    out: List[Token] = []
    for i, word in enumerate(standard_words(text), start=1):
        for gram in ngram_generate(word, min_size, max_size, edge):
            out.append(Token(gram, i))
    return out

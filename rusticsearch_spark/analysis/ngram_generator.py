"""Grapheme-cluster-aware ngram generation.

Semantics of /root/reference/src/analysis/ngram_generator.rs:28-115
(validated by the ported goldens at ngram_generator.rs:118-218):

* the unit is the *extended grapheme cluster* (``\\X``), not the
  codepoint — combining marks travel with their base;
* ``max_size`` is clamped to the word's grapheme length;
* Edge.NEITHER: for each start index, grams of every size
  ``min..=max`` that fit, sizes ascending, starts ascending;
* Edge.LEFT: grams anchored at the start, sizes ascending;
* Edge.RIGHT: grams anchored at the *end*, sizes ascending
  (``"hello",2,4 → lo, llo, ello``);
* degenerate sizes (0, min > len, min > max) produce nothing.
"""

from __future__ import annotations

import enum
from typing import List

import regex

_GRAPHEME = regex.compile(r"\X")


class Edge(enum.Enum):
    NEITHER = "neither"
    LEFT = "left"
    RIGHT = "right"


def graphemes(word: str) -> List[str]:
    return _GRAPHEME.findall(word)


def ngram_generate(word: str, min_size: int, max_size: int,
                   edge: Edge = Edge.NEITHER) -> List[str]:
    gs = graphemes(word)
    n = len(gs)
    max_size = min(max_size, n)
    if min_size <= 0 or max_size <= 0 or min_size > max_size:
        return []
    out: List[str] = []
    if edge is Edge.LEFT:
        for size in range(min_size, max_size + 1):
            out.append("".join(gs[:size]))
    elif edge is Edge.RIGHT:
        for size in range(min_size, max_size + 1):
            out.append("".join(gs[n - size:]))
    else:
        for start in range(0, n - min_size + 1):
            for size in range(min_size, max_size + 1):
                if start + size > n:
                    break
                out.append("".join(gs[start:start + size]))
    return out

"""Analyzer chains and ES-style ``settings.analysis`` config parsing.

An :class:`Analyzer` composes a tokenizer with a filter list, like the
reference's ``AnalyzerSpec`` (/root/reference/src/analysis/mod.rs:52-68).
The default "standard" analyzer is Standard tokenizer + Lowercase +
ASCIIFolding (/root/reference/src/mapping/mod.rs:22-30,
/root/reference/src/index/metadata/mod.rs:42-48).

Config parsing mirrors
/root/reference/src/index/metadata/parse/analysis_tokenizer.rs:18-118,
analysis_filter.rs:18-159, analysis_analyzer.rs:19-60:

* tokenizers: ``standard``, ``lowercase``, ``ngram``/``nGram``,
  ``edgeNGram``/``edge_ngram`` (min_gram default 1, max_gram default 2,
  side ``front``/``back``);
* filters: ``lowercase``, ``asciifolding``, ``ngram``/``nGram``,
  ``edgeNGram``/``edge_ngram``;
* analyzers: ``type: custom`` with a named tokenizer + filter list.

The extra ``simple`` analyzer (lowercased ``[a-z0-9]+`` runs) is an
engine extension used where the analysis must also be expressible in
ANSI SQL (the DuckDB correctness oracle).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from .filters import ascii_folding_filter, lowercase_filter, ngram_filter
from .ngram_generator import Edge
from .tokenizers import (Token, ngram_tokenize, standard_tokenize,
                         standard_words)

_SIMPLE_RE = re.compile(r"[a-z0-9]+")

FilterFn = Callable[[List[Token]], List[Token]]


@dataclass(frozen=True)
class Analyzer:
    """tokenizer + ordered filters; ``analyze`` yields (term, position).

    ``words_fn``/``term_fns`` are an optional string-level fast path
    for the hot indexing loop: when every filter is a pure per-term
    string function (lowercase, asciifold), ``terms`` skips Token
    object construction entirely — 2-4× faster, identical output
    (pinned by tests/test_analysis.py parity asserts).
    """

    name: str
    tokenizer: Callable[[str], List[Token]]
    filters: Tuple[FilterFn, ...] = ()
    words_fn: Optional[Callable[[str], List[str]]] = None
    term_fns: Optional[Tuple[Callable[[str], str], ...]] = None
    #: Pure-Spark-SQL expression of this chain, valid on rows whose
    #: text contains no non-ASCII *word-relevant* character (see
    #: ``index.build.SQL_UNSAFE_CHAR``): "word_lower" = standard word
    #: regex + lower() (standard / lowercase analyzers — asciifold is
    #: a no-op on ASCII tokens), "simple" = lower() + [a-z0-9]+ runs.
    #: None = Python (pandas UDF) only.  Keeps the indexing hot path
    #: JVM-side / whole-stage-codegen for web text; parity with the
    #: Python chain is pinned by tests/test_sql_tokenize_parity.py.
    sql_kind: Optional[str] = None

    def analyze(self, text: Optional[str]) -> List[Token]:
        if not text:
            return []
        tokens = self.tokenizer(text)
        for f in self.filters:
            tokens = f(tokens)
        return tokens

    def terms(self, text: Optional[str]) -> List[str]:
        if not text:
            return []
        if self.words_fn is not None and self.term_fns is not None:
            words = self.words_fn(text)
            for fn in self.term_fns:
                words = list(map(fn, words))
            return words
        return [t.term for t in self.analyze(text)]


def _simple_words(text: str) -> List[str]:
    return _SIMPLE_RE.findall(text.lower())


def _simple_tokenize(text: str) -> List[Token]:
    return [Token(w, i) for i, w in enumerate(_simple_words(text), start=1)]


def standard_analyzer() -> Analyzer:
    from .filters import ascii_fold
    from .tokenizers import standard_words
    return Analyzer("standard", standard_tokenize,
                    (lowercase_filter, ascii_folding_filter),
                    words_fn=standard_words,
                    term_fns=(str.lower, ascii_fold),
                    sql_kind="word_lower")


def simple_analyzer() -> Analyzer:
    return Analyzer("simple", _simple_tokenize,
                    words_fn=_simple_words, term_fns=(),
                    sql_kind="simple")


_EDGE_SIDES = {"front": Edge.LEFT, "back": Edge.RIGHT}


class AnalyzerRegistry:
    """Named analyzers; pre-seeded with the built-ins."""

    def __init__(self) -> None:
        self._analyzers: Dict[str, Analyzer] = {
            "standard": standard_analyzer(),
            "simple": simple_analyzer(),
            "lowercase": Analyzer(
                "lowercase", standard_tokenize, (lowercase_filter,),
                words_fn=standard_words, term_fns=(str.lower,),
                sql_kind="word_lower"),
        }

    def get(self, name: str) -> Analyzer:
        try:
            return self._analyzers[name]
        except KeyError:
            raise KeyError(f"unknown analyzer: {name!r}") from None

    def register(self, analyzer: Analyzer) -> None:
        self._analyzers[analyzer.name] = analyzer

    def names(self) -> List[str]:
        return sorted(self._analyzers)


def _parse_tokenizer(name: str, conf: dict) -> Callable[[str], List[Token]]:
    ttype = conf.get("type", name)
    if ttype == "standard":
        return standard_tokenize
    if ttype == "lowercase":
        return lambda text: lowercase_filter(standard_tokenize(text))
    if ttype in ("ngram", "nGram"):
        mn = int(conf.get("min_gram", 1))
        mx = int(conf.get("max_gram", 2))
        return lambda text: ngram_tokenize(text, mn, mx, Edge.NEITHER)
    if ttype in ("edgeNGram", "edge_ngram"):
        mn = int(conf.get("min_gram", 1))
        mx = int(conf.get("max_gram", 2))
        edge = _EDGE_SIDES.get(conf.get("side", "front"), Edge.LEFT)
        return lambda text: ngram_tokenize(text, mn, mx, edge)
    raise ValueError(f"unknown tokenizer type: {ttype!r}")


def _parse_filter(name: str, conf: dict) -> FilterFn:
    ftype = conf.get("type", name)
    if ftype == "lowercase":
        return lowercase_filter
    if ftype == "asciifolding":
        return ascii_folding_filter
    if ftype in ("ngram", "nGram"):
        mn = int(conf.get("min_gram", 1))
        mx = int(conf.get("max_gram", 2))
        return lambda toks: ngram_filter(toks, mn, mx, Edge.NEITHER)
    if ftype in ("edgeNGram", "edge_ngram"):
        mn = int(conf.get("min_gram", 1))
        mx = int(conf.get("max_gram", 2))
        edge = _EDGE_SIDES.get(conf.get("side", "front"), Edge.LEFT)
        return lambda toks: ngram_filter(toks, mn, mx, edge)
    raise ValueError(f"unknown filter type: {ftype!r}")


def parse_analysis_settings(settings: dict) -> AnalyzerRegistry:
    """Parse an ES-style ``settings.analysis`` dict into a registry."""
    analysis = settings.get("settings", settings).get("analysis", settings)
    registry = AnalyzerRegistry()
    tokenizers: Dict[str, Callable[[str], List[Token]]] = {
        "standard": standard_tokenize,
        "lowercase": lambda text: lowercase_filter(standard_tokenize(text)),
    }
    for name, conf in (analysis.get("tokenizer") or {}).items():
        tokenizers[name] = _parse_tokenizer(name, conf or {})
    filters: Dict[str, FilterFn] = {
        "lowercase": lowercase_filter,
        "asciifolding": ascii_folding_filter,
    }
    for name, conf in (analysis.get("filter") or {}).items():
        filters[name] = _parse_filter(name, conf or {})
    for name, conf in (analysis.get("analyzer") or {}).items():
        conf = conf or {}
        atype = conf.get("type", "custom")
        if atype != "custom":
            raise ValueError(f"unknown analyzer type: {atype!r}")
        tok_name = conf.get("tokenizer", "standard")
        if tok_name not in tokenizers:
            raise ValueError(f"unknown tokenizer: {tok_name!r}")
        filt_names = conf.get("filter", []) or []
        try:
            chain = tuple(filters[f] for f in filt_names)
        except KeyError as exc:
            raise ValueError(f"unknown filter: {exc.args[0]!r}") from None
        registry.register(Analyzer(name, tokenizers[tok_name], chain))
    return registry

"""SQL fast-path tokenization == Python analyzer chain.

The build routes rows with no non-ASCII *word-relevant* character
through a pure-SQL expression (index/build.py: sql_terms_column) and
everything else through the pandas-UDF Python chain.  These tests pin:

1. the SQL expression agrees byte-for-byte with the Python chain on
   SQL-safe rows (goldens + randomized corpus);
2. the SQL_UNSAFE_CHAR routing predicate sends every row where the two
   paths could diverge to the Python side (adversarial corpus: the
   union of both paths equals the Python chain on ALL rows).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rusticsearch_spark.analysis.analyzers import AnalyzerRegistry
from rusticsearch_spark.index.build import (ASCII_WORD_PATTERN,
                                            SQL_UNSAFE_CHAR,
                                            sql_terms_column)

# goldens: ASCII words, mid-punctuation joins, digits, symbols-only
# non-ASCII (safe), and word-relevant non-ASCII (unsafe → Python path)
GOLDEN = [
    "Hello world",
    "don't stop, won't 3.14 1,000 a:b c_d",
    "trailing' 'leading mixed'.case A'B'C",
    "© example en — home > docs ™ • «quoted»",  # symbols: separators
    "tabs\tand\nnewlines  collapse",
    "",
    "'''",
    "UPPER lower MiXeD 42x7",
    "no.break.chain a.b.c.d 1.2.3",
    # unsafe rows (must route to Python): accents, curly quote, CJK
    "café naïve façade",
    "don’t",
    "日本語 テスト ひらがな",
    "Ω≈ç√ resumé",
]

_WORDY = "abcdefgXYZ0189_"
_JOIN = "'.,:"
_SEP = " \t-©™—•«»!?;()&%  "
_UNSAFE = "éΩ日ひカ’́"


def _rand_corpus(n: int, alphabet: str, seed: int) -> list:
    rng = random.Random(seed)
    return ["".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 60)))
            for _ in range(n)]


@pytest.mark.parametrize("analyzer_name", ["standard", "lowercase",
                                           "simple"])
def test_sql_path_matches_python_chain(spark, analyzer_name):
    analyzer = AnalyzerRegistry().get(analyzer_name)
    assert analyzer.sql_kind is not None
    texts = (GOLDEN
             + _rand_corpus(150, _WORDY + _JOIN + _SEP, seed=7)
             + _rand_corpus(150, _WORDY + _JOIN + _SEP + _UNSAFE, seed=11))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    unsafe = F.col("text").rlike(SQL_UNSAFE_CHAR)
    got = {
        r["i"]: (r["terms"], r["unsafe"])
        for r in df.select(
            "i", unsafe.alias("unsafe"),
            sql_terms_column(analyzer.sql_kind, F.col("text"))
            .alias("terms")).collect()
    }
    n_safe = 0
    for i, t in enumerate(texts):
        expect = analyzer.terms(t)
        terms, routed_unsafe = got[i]
        if not routed_unsafe:
            n_safe += 1
            assert terms == expect, (analyzer_name, t, terms, expect)
        else:
            # unsafe rows go to the Python chain in the build — just
            # confirm the predicate fired for every divergent case
            if terms != expect:
                assert routed_unsafe
    assert n_safe >= len(texts) // 2  # the fast path actually fires


def test_routing_is_exhaustive(spark):
    """Any row where SQL != Python must be flagged unsafe."""
    analyzer = AnalyzerRegistry().get("standard")
    texts = GOLDEN + _rand_corpus(400, _WORDY + _JOIN + _SEP + _UNSAFE,
                                  seed=23)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    rows = df.select(
        "i", F.col("text").rlike(SQL_UNSAFE_CHAR).alias("unsafe"),
        sql_terms_column("word_lower", F.col("text")).alias("terms"),
    ).collect()
    for r in rows:
        expect = analyzer.terms(texts[r["i"]])
        if r["terms"] != expect:
            assert r["unsafe"], (texts[r["i"]], r["terms"], expect)


def test_ascii_word_pattern_matches_fast_path():
    """The SQL regex is the same language as the Python ASCII regex."""
    from rusticsearch_spark.analysis.tokenizers import _ASCII_WORD
    assert ASCII_WORD_PATTERN == _ASCII_WORD.pattern

"""Vectorized pandas-UDF wrappers for the analysis chain.

These are the only places analysis code crosses into Spark — each
analyzer becomes ONE fused Arrow-batched pandas UDF (string column in,
``array<string>`` term column out), so a full analyzer chain costs a
single Python round trip per batch
(/root/reference/src/analysis/mod.rs:52-68 composes iterators; we fuse
the same chain inside one UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analyzers import Analyzer
from .html_strip import html_to_text


def terms_udf(analyzer: Analyzer):
    """pandas UDF: text column → array<string> of analyzed terms
    (duplicates preserved — term frequency = multiplicity)."""
    analyze = analyzer.terms

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _analyze(texts: pd.Series) -> pd.Series:
        return texts.map(lambda s: analyze(s) if s is not None else [])

    return _analyze


def tokens_udf(analyzer: Analyzer):
    """pandas UDF: text → array<struct<term,position>> (for callers
    needing positions, e.g. the array-flattening mapping rule)."""
    analyze = analyzer.analyze
    schema = T.ArrayType(T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("position", T.IntegerType()),
    ]))

    @F.pandas_udf(schema)
    def _analyze(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda s: [(t.term, t.position) for t in analyze(s)]
            if s is not None else [])

    return _analyze


@F.pandas_udf(T.StringType())
def html_strip_udf(html: pd.Series) -> pd.Series:
    """binary/string HTML column → deterministic extracted text."""
    return html.map(lambda h: html_to_text(h) if h is not None else None)

"""Text-analysis operators for large-scale corpus pipelines.

Everything here is pure native Spark SQL expressions — no Python UDFs
in the hot path — so the plans stay inside whole-stage codegen and
scale linearly with executors.  The reference engine has no analogue
(SURVEY.md §2.7); these are the training-data-pipeline extensions.

Tokenization for these ops is the SQL-expressible "simple" analyzer:
``[a-z0-9]+`` runs over lowercased text — deliberately chosen so every
op has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
# "BPE-ish": word pieces OR single non-space punctuation
BPE_RE = "[a-z0-9]+|[^a-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "du"],
}


def tokens_col(text_col: str = "text") -> Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def token_count(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_bpe_tokens) — whitespace-word + BPE-ish regex
    token counts."""
    return df.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).alias("n_tokens"),
        # NB: pattern as a lit Column, not inside F.expr — Spark SQL
        # string literals would swallow the backslash escapes.
        F.size(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(BPE_RE), F.lit(0)
        )).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc quality features: token count, mean token length,
    alpha ratio, stopword ratio (EN), distinct-token ratio — the
    standard cheap filters of a web-corpus pipeline."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_sw = F.size(F.array_intersect(toks, sw))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(F.length(F.col(text_col)) / F.greatest(n, F.lit(1)), 4)
        .alias("chars_per_token"),
        F.round(F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 4)
        .alias("distinct_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
            / F.greatest(n, F.lit(1)), 4).alias("stopword_ratio"),
        (n_sw >= 2).alias("passes_stopword_filter"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count stopword hits per language over
    the token multiset; argmax wins, ties/zeros → 'und'."""
    toks = tokens_col(text_col)

    def _hits(lang: str) -> Column:
        words = list(STOPWORDS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    hits = {lang: _hits(lang) for lang in STOPWORDS}
    en, es, fr = hits["en"], hits["es"], hits["fr"]
    best = F.greatest(en, es, fr)
    guess = (F.when(best == 0, "und")
             .when(en == best, "en")
             .when(es == best, "es")
             .otherwise("fr"))
    return df.select(F.col(id_col), en.alias("hits_en"), es.alias("hits_es"),
                     fr.alias("hits_fr"), guess.alias("lang_guess"))


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", shingle: int = 3) -> DataFrame:
    """Winnowing-style fingerprint: the minimum md5 over the doc's
    token ``shingle``-grams (lead() window over exploded tokens — pure
    SQL, no UDF).  Equal fingerprints ⇒ near-certain shingle overlap."""
    from pyspark.sql import Window
    toks = df.select(F.col(id_col),
                     F.posexplode(tokens_col(text_col))
                     .alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    sh = toks.select(
        F.col(id_col),
        F.concat_ws(" ", F.col("tok"),
                    F.lead("tok", 1).over(w),
                    F.lead("tok", 2).over(w)).alias("sh"),
        F.lead("tok", shingle - 1).over(w).alias("_last"))
    return (sh.where(F.col("_last").isNotNull())
            .groupBy(id_col)
            .agg(F.min(F.md5(F.col("sh"))).alias("fingerprint")))

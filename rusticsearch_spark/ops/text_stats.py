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

# The quality-score filter keeps the original compact EN list (its
# oracle SQL inlines these ten words verbatim).
_QUALITY_SW = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]

# Language-ID stopword table: the most frequent FUNCTION words of ten
# languages (public knowledge; standard top-stopword lists), ASCII
# spellings only because the `simple` tokenizer emits [a-z0-9]+ runs
# (accented words would split and never match).  Collisions across
# languages ("de", "la", "en", ...) are fine — each language counts
# hits independently and the argmax decides.
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "mit",
           "dem", "den", "ein", "eine", "zu", "auf", "sich", "im",
           "auch", "es"],
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for",
           "on", "that", "with", "as", "was", "at", "by", "this",
           "have"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es",
           "por", "con", "los", "las", "del", "se", "para", "no",
           "su"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour",
           "du", "les", "des", "dans", "qui", "pas", "sur", "avec",
           "par"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "saya",
           "ke", "karena", "ada", "mereka"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "con",
           "del", "non", "sono", "le", "si", "da", "come", "anche",
           "ma"],
    "nl": ["de", "het", "een", "en", "van", "ik", "te", "dat", "die",
           "in", "je", "niet", "zijn", "is", "was", "op", "aan",
           "met"],
    "pt": ["o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
           "para", "com", "os", "as", "por", "mais", "dos", "como"],
    "sv": ["och", "att", "det", "som", "en", "den", "med", "var",
           "sig", "om", "har", "inte", "av", "till", "man", "men",
           "ett", "vid"],
    "tr": ["bir", "ve", "bu", "da", "de", "o", "ben", "ama", "gibi",
           "daha", "sonra", "kadar", "ile", "mi", "ne", "var", "yok",
           "sen"],
}
LANGS = sorted(STOPWORDS)        # tie-break order: lang code asc


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
    sw = F.array([F.lit(w) for w in _QUALITY_SW])
    n_sw = F.size(F.array_intersect(toks, sw))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(F.length(F.col(text_col)) / F.greatest(n, F.lit(1)), 4)
        .alias("chars_per_token"),
        F.round(F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 4)
        .alias("distinct_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: t.isin(_QUALITY_SW)))
            / F.greatest(n, F.lit(1)), 4).alias("stopword_ratio"),
        (n_sw >= 2).alias("passes_stopword_filter"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID over ten languages: stopword hits per
    language on the token multiset; argmax wins (ties → lang code
    asc), zero hits → 'und'.  Emits the decision evidence too:
    ``best_hits``, ``total_hits`` (sum across languages), ``margin``
    (best − runner-up) and ``confidence`` (best / total, 0 when no
    hits) — the downstream filter knobs a corpus pipeline needs.

    Pure native SQL expressions (array of (hits, rank) structs,
    sort_array picks the winner) — codegen the whole way, linear at
    any corpus size."""
    toks = tokens_col(text_col)

    def _hits(lang: str) -> Column:
        words = list(STOPWORDS[lang])
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    # struct (hits, -lang_index): descending sort yields highest hits
    # first, ties broken by the LOWEST index (= lang code asc)
    pairs = F.array(*[
        F.struct(_hits(lang).alias("h"), F.lit(-i).alias("n"))
        for i, lang in enumerate(LANGS)])
    ranked = F.sort_array(pairs, asc=False)
    best, second = ranked[0], ranked[1]
    langs_lit = F.array(*[F.lit(c) for c in LANGS])
    total = F.aggregate(pairs, F.lit(0), lambda a, p: a + p["h"])
    guess = (F.when(best["h"] == 0, "und")
             .otherwise(F.element_at(langs_lit, -best["n"] + 1)))
    return df.select(
        F.col(id_col),
        guess.alias("lang_guess"),
        best["h"].alias("best_hits"),
        total.cast("int").alias("total_hits"),
        (best["h"] - second["h"]).alias("margin"),
        F.round(best["h"] / F.greatest(total, F.lit(1)), 4)
        .alias("confidence"))


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

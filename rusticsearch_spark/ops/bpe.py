"""Real byte-pair-encoding token counting (VERDICT r3 #5).

Replaces the "BPE-ish" regex proxy with actual byte-pair merges:

* ``train_bpe`` — the classic merge-training algorithm (Sennrich et
  al. 2016, "Neural Machine Translation of Rare Words with Subword
  Units" — public method): repeatedly count adjacent symbol pairs
  over the word-frequency vocabulary and merge the most frequent
  pair; deterministic tie-break (count desc, pair lexicographic).
* ``DEFAULT_MERGES`` — a demonstration vocabulary trained at import
  time on the embedded seed text below (self-contained: no network,
  no external files; the container has no tokenizer-vocab assets).
  Swap in any public merges table (e.g. GPT-2's) by passing your own
  ``merges`` list.
* encoding — merges applied in RANK ORDER, one left-to-right
  replace-all pass per rule.  This "replace-chain" form is chosen
  deliberately: it is expressible IDENTICALLY as a chain of native
  ``replace`` calls in Spark SQL (whole-stage codegen, zero Python
  in the hot path) and in ANSI/DuckDB SQL for the oracle, and the
  pure-Python reference encoder below implements exactly the same
  semantics for goldens.  (A symbol pair, once merged away, can
  never re-form — merges only concatenate symbols — so rank-order
  single-pass application is a sound BPE encoder.)

Representation: a word becomes its characters each FOLLOWED by the
separator ``~`` (tokens are ``[a-z0-9]+`` so ``~`` never collides);
merging pair (a, b) rewrites ``a~b`` → ``ab``; the token count is
simply the number of separators remaining.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "~"
TOKEN_RE = "[a-z0-9]+"

#: Deterministic seed text for the demonstration vocabulary (plain
#: descriptive English written for this repo; the trained merges are
#: a function of nothing but this string and N_MERGES).
SEED_TEXT = """
the quick brown fox jumps over the lazy dog while the queries stream
through the engine and the tables merge in sorted order the tokens
flow into posting lists and the scores rank the documents for the
search the index builds from the pages and the words split into
subword units that the encoder merges into tokens the count of the
tokens measures the length of the text for the training data pipeline
and the filters keep the quality high while the duplicates drop out
"""

N_MERGES = 40


def _words(text: str) -> List[str]:
    return re.findall(TOKEN_RE, text.lower())


def train_bpe(text: str, n_merges: int = N_MERGES
              ) -> List[Tuple[str, str]]:
    """Classic BPE merge training over the word-frequency vocabulary
    of ``text``.  Returns merges in rank order."""
    vocab: Dict[Tuple[str, ...], int] = {}
    for w in _words(text):
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + 1
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: Dict[Tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and (sym[i], sym[i + 1]) == best):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            merged[k] = merged.get(k, 0) + freq
        vocab = merged
    return merges


DEFAULT_MERGES: List[Tuple[str, str]] = train_bpe(SEED_TEXT)


def bpe_encode_py(word: str, merges: Sequence[Tuple[str, str]]
                  ) -> List[str]:
    """Reference encoder: EXACTLY the replace-chain semantics the
    Spark expression and the SQL oracle execute (one left-to-right
    replace-all pass per merge, in rank order)."""
    rep = "".join(c + SEP for c in word)
    for a, b in merges:
        rep = rep.replace(a + SEP + b, a + b)
    return [t for t in rep.split(SEP) if t]


def bpe_token_count_py(text: str,
                       merges: Sequence[Tuple[str, str]]) -> int:
    return sum(len(bpe_encode_py(w, merges)) for w in _words(text))


def _rep_chain_col(word: Column,
                   merges: Sequence[Tuple[str, str]]) -> Column:
    """word → merged separator representation, as native SQL exprs
    (regexp_replace + a chain of replace calls: whole-stage codegen,
    no Python)."""
    rep = F.regexp_replace(word, "(.)", "$1" + SEP)
    for a, b in merges:
        rep = F.replace(rep, F.lit(a + SEP + b), F.lit(a + b))
    return rep


def bpe_token_count_col(text_col: str,
                        merges: Sequence[Tuple[str, str]] = None
                        ) -> Column:
    """Total BPE token count of ``text_col`` (the remaining-separator
    count summed over words)."""
    merges = DEFAULT_MERGES if merges is None else merges
    words = F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
    counts = F.transform(
        words,
        lambda w: (lambda rep: F.length(rep) - F.length(
            F.replace(rep, F.lit(SEP), F.lit(""))))(
                _rep_chain_col(w, merges)))
    return F.aggregate(counts, F.lit(0),
                       lambda acc, v: acc + v).cast("long")


def token_count_bpe(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    merges: Sequence[Tuple[str, str]] = None
                    ) -> DataFrame:
    """(id, n_bpe) per document — linear scan, codegen-only."""
    return df.select(
        F.col(id_col),
        bpe_token_count_col(text_col, merges).alias("n_bpe"))


def bpe_token_count_sql(merges: Sequence[Tuple[str, str]] = None,
                        text_expr: str = "text") -> str:
    """DuckDB expression computing the identical count (RE2 has no
    lookahead, hence the append-separator-to-every-char form shared
    with the Spark side)."""
    merges = DEFAULT_MERGES if merges is None else merges
    chain = f"regexp_replace(w, '(.)', '\\1{SEP}', 'g')"
    for a, b in merges:
        chain = f"replace({chain}, '{a}{SEP}{b}', '{a}{b}')"
    return f"""COALESCE(list_sum(list_transform(
      list_transform(regexp_extract_all(lower({text_expr}),
                                        '{TOKEN_RE}'), w -> {chain}),
      r -> length(r) - length(replace(r, '{SEP}', '')))), 0)::BIGINT"""

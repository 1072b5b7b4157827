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
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
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


def train_bpe_fast(word_freqs: Dict[str, int], n_merges: int
                   ) -> List[Tuple[str, str]]:
    """Incremental-count BPE trainer — identical output to
    ``train_bpe`` (same tie-break: count desc, pair lexicographic
    asc), but updates pair counts only for words containing the
    merged pair instead of recounting the whole vocabulary per merge
    (the standard subword-nmt optimization; public method).  Makes a
    ≥10k-merge vocabulary trainable in seconds."""
    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs.items():
        words.append(list(w))
        freqs.append(f)
    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for wi, sym in enumerate(words):
        f = freqs[wi]
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        best, best_c = None, 0
        for p, c in pair_counts.items():
            if c > best_c or (c == best_c and best is not None
                              and p < best):
                best, best_c = p, c
        if best is None or best_c <= 0:
            break
        merges.append(best)
        a, b = best
        for wi in list(pair_words.get(best, ())):
            sym = words[wi]
            f = freqs[wi]
            # remove this word's old pair contributions
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            out: List[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
    return merges


def train_bpe_heap(word_freqs: Dict[str, int], n_merges: int
                   ) -> List[Tuple[str, str]]:
    """Heap-accelerated BPE trainer — identical output to
    ``train_bpe_fast`` / ``train_bpe`` (same tie-break: count desc,
    pair lexicographic asc), but best-pair selection is a LAZY
    MAX-HEAP instead of a full scan of the pair-count dict per merge
    (stale heap entries are discarded on pop by comparing against
    the live count — the standard lazy-deletion pattern).  Per-merge
    cost drops from O(#pairs) to O(touched · log #heap), which is
    what makes a 50k-merge vocabulary trainable in seconds; parity
    with the scan trainer is pytest-pinned."""
    import heapq
    words: List[List[str]] = []
    freqs: List[int] = []
    for w, f in word_freqs.items():
        words.append(list(w))
        freqs.append(f)
    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for wi, sym in enumerate(words):
        f = freqs[wi]
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(p: Tuple[str, str], c: int) -> None:
        if c > 0:
            heapq.heappush(heap, (-c, p))

    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        a, b = best
        touched: Dict[Tuple[str, str], int] = {}
        for wi in list(pair_words.get(best, ())):
            sym = words[wi]
            f = freqs[wi]
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= f
                touched[p] = 1
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            out: List[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                touched[p] = 1
                pair_words.setdefault(p, set()).add(wi)
        for p in touched:
            _bump(p, pair_counts.get(p, 0))
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


class ChainIndex:
    """Pruning index over a merge table for ``bpe_encode_fast``.

    Exactness argument: the separator representation always carries
    the word's characters in order (replaces only delete separators),
    so rule (a, b) — pattern ``a~b`` — can match at ANY point of the
    chain only if ``a+b`` occurs as a contiguous substring of the
    original word.  Indexing rules by their ``a+b`` string lets the
    encoder select the (few) candidate rules per word by substring
    lookup and run ONLY those replaces, in rank order — byte-identical
    to running the full chain (``bpe_encode_py``), including the
    chain's prefix-match quirk (``c~o`` fusing into ``c~or``), at
    O(|word|·maxlen) dict probes instead of O(n_merges) replaces."""

    def __init__(self, merges: Sequence[Tuple[str, str]]):
        self.by_ab: Dict[str, List[Tuple[int, str, str]]] = {}
        for r, (a, b) in enumerate(merges):
            self.by_ab.setdefault(a + b, []).append((r, a + SEP + b, a + b))
        self.maxlen = max((len(ab) for ab in self.by_ab), default=2)


def bpe_encode_fast(word: str, index: ChainIndex) -> List[str]:
    """Replace-chain BPE encoder with candidate-rule pruning —
    identical output to ``bpe_encode_py`` on ANY merge table (parity
    pinned by tests/test_bpe_langid.py), but cost independent of the
    vocabulary size: the scale path for real 10k+ vocabularies."""
    by_ab, maxlen = index.by_ab, index.maxlen
    L = len(word)
    cands: List[Tuple[int, str, str]] = []
    seen = set()
    for i in range(L - 1):
        top = min(L, i + maxlen)
        for j in range(i + 2, top + 1):
            sub = word[i:j]
            if sub not in seen:
                seen.add(sub)
                rules = by_ab.get(sub)
                if rules:
                    cands.extend(rules)
    rep = "".join(c + SEP for c in word)
    if cands:
        cands.sort()
        for _, pat, repl in cands:
            rep = rep.replace(pat, repl)
    return [t for t in rep.split(SEP) if t]


def bpe_token_count_udf_col(text_col: str,
                            merges: Sequence[Tuple[str, str]]) -> Column:
    """Total BPE token count via ONE Arrow-batched pandas UDF carrying
    the ChainIndex in its closure (~hundreds of KB at 10k merges
    — shipped once per task, reused across batches by worker reuse).
    A per-worker word→count cache exploits the Zipfian repetition of
    web text: each distinct word is encoded once per worker process.
    This is the scale path for REAL vocabularies (10k–50k merges),
    where the replace-chain form would build a 10k-deep Catalyst
    expression tree; the replace-chain stays as the ≤~100-merge
    oracle-checkable mode."""
    from pyspark.sql import types as T

    index = ChainIndex(merges)
    word_re = re.compile(TOKEN_RE)
    # BOUNDED per-worker cache: web-scale text has a Zipf head (hit
    # rate stays high at modest sizes) but an unbounded id/hash tail
    # would grow a long-lived reused worker to OOM.  On overflow,
    # drop wholesale and rebuild — O(1) amortized, no LRU bookkeeping
    # per hit, and the hot head repopulates within a batch.
    cache: Dict[str, int] = {}
    max_cache = 1_000_000

    @F.pandas_udf(T.LongType())
    def _count(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            n = 0
            if t:
                for w in word_re.findall(t.lower()):
                    c = cache.get(w)
                    if c is None:
                        if len(cache) >= max_cache:
                            cache.clear()
                        c = cache[w] = len(bpe_encode_fast(w, index))
                    n += c
            out.append(n)
        return pd.Series(out, dtype="int64")

    return _count(F.col(text_col))


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


#: Above this merge count the replace-chain expression form is
#: refused (a 10k-merge table would build a 10k-deep Catalyst tree)
#: and the Arrow-batched UDF path runs instead.
REPLACE_CHAIN_MAX = 128


def token_count_bpe(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    merges: Sequence[Tuple[str, str]] = None,
                    mode: str = "auto") -> DataFrame:
    """(id, n_bpe) per document — one linear scan.

    ``mode``: "expr" = replace-chain native SQL (codegen-only,
    oracle-expressible, ≤ REPLACE_CHAIN_MAX merges); "udf" = the
    Arrow-batched fast encoder (real 10k+ vocabularies); "auto"
    picks by vocabulary size."""
    merges = DEFAULT_MERGES if merges is None else merges
    if mode == "auto":
        mode = "expr" if len(merges) <= REPLACE_CHAIN_MAX else "udf"
    if mode == "expr":
        if len(merges) > REPLACE_CHAIN_MAX:
            raise ValueError(
                f"replace-chain mode caps at {REPLACE_CHAIN_MAX} merges "
                f"(got {len(merges)}); use mode='udf'")
        col = bpe_token_count_col(text_col, merges)
    elif mode == "udf":
        col = bpe_token_count_udf_col(text_col, merges)
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return df.select(F.col(id_col), col.alias("n_bpe"))


_MERGES_10K_PATH = __file__.replace("bpe.py", "bpe_merges_10k.txt")
_MERGES_50K_PATH = __file__.replace("bpe.py", "bpe_merges_50k.txt")
_MERGES_CACHE: Dict[str, List[Tuple[str, str]]] = {}


def load_merges(path: str) -> List[Tuple[str, str]]:
    """Load a merges.txt-shaped vocabulary (two space-separated
    symbols per line, rank order, ``#`` comments) — the public shape,
    so any real public vocabulary (e.g. GPT-2's merges, lowercased
    alnum subset) drops in as a file copy."""
    cached = _MERGES_CACHE.get(path)
    if cached is None:
        out: List[Tuple[str, str]] = []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                a, b = line.rstrip("\n").split(" ", 1)
                out.append((a, b))
        cached = _MERGES_CACHE[path] = out
    return cached


def load_merges_10k() -> List[Tuple[str, str]]:
    """The shipped 10,240-merge vocabulary, trained deterministically
    on the driver-generated documents corpus by
    scripts/train_bpe_vocab.py (provenance in the file header)."""
    return load_merges(_MERGES_10K_PATH)


def load_merges_50k() -> List[Tuple[str, str]]:
    """The 51,200-merge stress vocabulary (same trainer, 200k-word
    synthetic corpus) — proves the fast-encoder scale path carries a
    GPT-2-sized table: candidate-rule pruning makes per-word cost
    independent of vocabulary size (tests + the bench note in
    docs/COVERAGE.md)."""
    return load_merges(_MERGES_50K_PATH)


def bpe_token_count_sql_rec(merges: Sequence[Tuple[str, str]],
                            text_expr: str = "text") -> str:
    """DuckDB oracle for the FAST-ENCODER path at real vocabulary
    sizes (10k+ merges), where the replace-chain expression form of
    ``bpe_token_count_sql`` cannot be built.

    Key insight (same exactness argument as :class:`ChainIndex`):
    rule (a, b) can fire on a word only if ``a+b`` occurs as a
    contiguous substring of the ORIGINAL word, so the chain over 10k
    rules collapses, per word, to its few CANDIDATE rules applied in
    rank order.  The oracle therefore joins the distinct words
    against the merges relation on ``contains(word, ab)``, collects
    each word's candidate (pattern, replacement) lists sorted by
    rank, and folds the replaces with a recursive CTE whose depth is
    the per-word candidate count — bounded by |word|^2, independent
    of vocabulary size.  Byte-identical to ``bpe_encode_fast`` (and
    hence to the full replace chain) by construction.

    The merges table is embedded as ONE newline-joined string
    literal (tokens are ``[a-z0-9]+`` so no escaping is needed —
    enforced below), keeping the oracle self-contained: no file
    reads, no registered relations beyond the driver's views."""
    lit_lines = []
    for a, b in merges:
        pair = a + b
        if not (pair.isascii() and pair.isalnum()):
            raise ValueError(f"non-alnum merge pair {(a, b)!r}")
        lit_lines.append(a + " " + b)
    lit = "\n".join(lit_lines)
    return f"""
WITH RECURSIVE bpe_raw AS (
  SELECT unnest(string_split('{lit}', chr(10))) AS line,
         unnest(range({len(merges)})) AS rank
), bpe_m AS (
  SELECT rank, split_part(line,' ',1) || '{SEP}' ||
               split_part(line,' ',2) AS pat,
         split_part(line,' ',1) || split_part(line,' ',2) AS ab
  FROM bpe_raw
), bpe_doc_words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower({text_expr}),
                                   '{TOKEN_RE}')) AS word
  FROM documents WHERE {text_expr} IS NOT NULL
), bpe_uw AS (SELECT DISTINCT word FROM bpe_doc_words
), bpe_prog AS (
  SELECT bpe_uw.word, list(m.pat ORDER BY m.rank) AS pats,
         list(m.ab ORDER BY m.rank) AS repls
  FROM bpe_uw JOIN bpe_m m ON contains(bpe_uw.word, m.ab)
  GROUP BY bpe_uw.word
), bpe_enc AS (
  SELECT bpe_uw.word,
         regexp_replace(bpe_uw.word, '(.)', '\\1{SEP}', 'g') AS rep,
         coalesce(p.pats, []) AS pats,
         coalesce(p.repls, []) AS repls, 0 AS i
  FROM bpe_uw LEFT JOIN bpe_prog p USING (word)
  UNION ALL
  SELECT word, replace(rep, pats[i+1], repls[i+1]), pats, repls, i+1
  FROM bpe_enc WHERE i < len(pats)
), bpe_counts AS (
  SELECT word,
         length(rep) - length(replace(rep,'{SEP}','')) AS n
  FROM bpe_enc WHERE i = len(pats)
)
SELECT d.doc_id, coalesce(s.n, 0)::BIGINT AS n_bpe
FROM (SELECT doc_id FROM documents WHERE {text_expr} IS NOT NULL) d
LEFT JOIN (
  SELECT dw.doc_id, sum(c.n) AS n
  FROM bpe_doc_words dw JOIN bpe_counts c USING (word)
  GROUP BY dw.doc_id
) s USING (doc_id)
"""


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

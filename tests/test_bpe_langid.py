"""Real-BPE token counting (ops/bpe.py) and 10-language lang-id.

BPE contracts: the trainer is the classic pair-count/merge loop; the
Spark replace-chain, the DuckDB oracle expression, and the pure-
Python reference encoder all implement the SAME rank-ordered
replace-all semantics, so all three must agree token-for-token.
"""

from __future__ import annotations

import duckdb
import pytest

from rusticsearch_spark.ops.bpe import (DEFAULT_MERGES, SEED_TEXT,
                                        bpe_encode_py,
                                        bpe_token_count_py,
                                        bpe_token_count_sql, token_count_bpe,
                                        train_bpe)

SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "tokenization of the training corpus",
    "a b c d e 123 the the the",
    "",
    "unseenwordsxyzq withnovocabularyoverlap",
    "merge merge merges merging merged",
]


def test_trainer_is_deterministic_and_greedy():
    m1 = train_bpe(SEED_TEXT)
    m2 = train_bpe(SEED_TEXT)
    assert m1 == m2 == DEFAULT_MERGES
    assert len(m1) == 40 and len(set(m1)) == 40
    # 'the' dominates the seed text: first merges must build it
    assert m1[0] == ("t", "h") and m1[1] == ("th", "e")


def test_trainer_tiny_golden():
    # "aaab" ×2: pairs (a,a)=4, (a,b)=2 → merge (a,a) first; then
    # symbols (aa,a,b): pairs (aa,a)=2,(a,b)=2 → lexicographic tie-
    # break picks ("a","b")
    assert train_bpe("aaab aaab", 2) == [("a", "a"), ("a", "b")]


def test_encode_goldens():
    assert bpe_encode_py("the", DEFAULT_MERGES) == ["the"]
    # unknown word falls back to characters (no merges apply)
    assert bpe_encode_py("xyzq", DEFAULT_MERGES) == list("xyzq")
    for w in ["tokens", "merging", "documents", "a"]:
        toks = bpe_encode_py(w, DEFAULT_MERGES)
        assert "".join(toks) == w          # lossless partition
        assert 1 <= len(toks) <= len(w)


def test_duckdb_oracle_matches_python_reference():
    con = duckdb.connect()
    expr = bpe_token_count_sql(text_expr="t")
    for s in SAMPLES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)",
                          [s]).fetchone()[0]
        assert got == bpe_token_count_py(s, DEFAULT_MERGES), s


def test_recursive_cte_oracle_matches_fast_encoder_10k():
    """The driver oracle for token_count_bpe_10k: the recursive
    candidate-fold CTE must reproduce the fast encoder (and hence
    the full 10,240-rule replace chain) byte-identically, on a
    corpus far richer than the sf0.01 vocabulary — including the
    chain's prefix-match quirk words, unseen words, and empty/NULL
    text rows."""
    from rusticsearch_spark.ops.bpe import (ChainIndex,
                                            bpe_encode_fast,
                                            bpe_token_count_sql_rec,
                                            load_merges_10k, _words)
    merges = load_merges_10k()
    idx = ChainIndex(merges)
    texts = SAMPLES + [
        SEED_TEXT,
        "corpus corpora interdependently microbenchmark 42x9",
        "retokenizers overcounted prestreaming unmergeable",
        None,
        "   ",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got = dict(con.execute(bpe_token_count_sql_rec(merges)).fetchall())
    want = {i: sum(len(bpe_encode_fast(w, idx)) for w in _words(t))
            for i, t in rows if t is not None}
    assert got == want
    # non-alnum merge pairs are refused (would break the literal)
    with pytest.raises(ValueError, match="non-alnum"):
        bpe_token_count_sql_rec([("a'", "b")])


def test_spark_expr_matches_python_reference(spark):
    rows = [(i, s) for i, s in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_bpe for r in token_count_bpe(df).collect()}
    for i, s in rows:
        assert got[i] == bpe_token_count_py(s, DEFAULT_MERGES), s


def test_bpe_compresses_english():
    """A trained vocab must beat character count on in-domain text."""
    s = "the tokens stream through the engine"
    n = bpe_token_count_py(s, DEFAULT_MERGES)
    assert n < sum(len(w) for w in s.split())
    assert n >= len(s.split())


# --- real-vocabulary path (10k merges, Arrow-batched UDF) ------------

def test_fast_trainer_matches_classic():
    from collections import Counter

    from rusticsearch_spark.ops.bpe import _words, train_bpe_fast
    assert (train_bpe_fast(dict(Counter(_words(SEED_TEXT))), 60)
            == train_bpe(SEED_TEXT, 60))


def test_fast_encoder_matches_replace_chain_reference():
    """bpe_encode_fast (pruned chain) must be byte-identical to
    bpe_encode_py (full chain) — including the chain's prefix-match
    quirk ('corpus' → ['cor','p','u','s'] via c~o matching inside
    c~or) — on the 40-merge demo vocab and the shipped 10k table."""
    from rusticsearch_spark.ops.bpe import (ChainIndex, bpe_encode_fast,
                                            load_merges_10k)
    idx40 = ChainIndex(DEFAULT_MERGES)
    assert bpe_encode_fast("corpus", idx40) == ["cor", "p", "u", "s"]
    for s in SAMPLES + [SEED_TEXT]:
        for w in s.split():
            if w.isalnum():
                assert (bpe_encode_fast(w.lower(), idx40)
                        == bpe_encode_py(w.lower(), DEFAULT_MERGES)), w
    merges10k = load_merges_10k()
    assert len(merges10k) >= 10_000
    idx = ChainIndex(merges10k)
    words = ["the", "tokenization", "prestreaming", "unmergeable",
             "xq9z", "retokenizers", "overcounted", "a",
             "interdependently", "microbenchmark"]
    for w in words:
        fast = bpe_encode_fast(w, idx)
        assert "".join(fast) == w
        assert fast == bpe_encode_py(w, merges10k), w


def test_heap_trainer_matches_scan_trainer():
    """train_bpe_heap (lazy-max-heap selection) must emit the exact
    merge sequence of train_bpe_fast / train_bpe, including the
    (count desc, pair lexicographic asc) tie order — it is the
    trainer that makes the 50k stress vocabulary buildable."""
    import sys
    from collections import Counter
    from rusticsearch_spark.ops.bpe import (_words, train_bpe_fast,
                                            train_bpe_heap)
    wf = dict(Counter(_words(SEED_TEXT)))
    assert train_bpe_heap(wf, 60) == train_bpe_fast(wf, 60)
    sys.path.insert(0, "scripts")
    from train_bpe_vocab import synth_word_freqs
    wf2 = dict(synth_word_freqs(600))
    assert train_bpe_heap(wf2, 400) == train_bpe_fast(wf2, 400)


def test_fast_encoder_matches_replace_chain_50k():
    """The 51,200-merge stress table: the pruned fast encoder must
    stay byte-identical to the full replace chain (51k sequential
    replaces per word) — the scale-path exactness claim at a real
    GPT-2-sized vocabulary."""
    from rusticsearch_spark.ops.bpe import (ChainIndex, bpe_encode_fast,
                                            bpe_encode_py,
                                            load_merges_50k)
    merges = load_merges_50k()
    assert len(merges) == 51_200
    idx = ChainIndex(merges)
    words = ["the", "prestreaming", "interdependently", "overcounted",
             "microbenchmark", "transformers", "retokenizers",
             "unmergeable", "xq9z", "a", "subword", "scaling",
             "deterministically", "strealk", "chaik"]
    for w in words:
        fast = bpe_encode_fast(w, idx)
        assert "".join(fast) == w
        assert fast == bpe_encode_py(w, merges), w


def test_udf_path_matches_expr_path(spark):
    """token_count_bpe mode='udf' ≡ mode='expr' on the demo vocab
    (same replace-chain semantics through two execution engines)."""
    from rusticsearch_spark.ops.bpe import load_merges_10k
    rows = [(i, s) for i, s in enumerate(SAMPLES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r.doc_id: r.n_bpe
            for r in token_count_bpe(df, mode="expr").collect()}
    udf = {r.doc_id: r.n_bpe
           for r in token_count_bpe(df, mode="udf").collect()}
    assert expr == udf
    # auto mode: a >128-merge table routes to the UDF; result equals
    # the pure-Python golden
    merges10k = load_merges_10k()
    got = {r.doc_id: r.n_bpe
           for r in token_count_bpe(df, merges=merges10k).collect()}
    for i, s in rows:
        assert got[i] == bpe_token_count_py(s, merges10k), s


def test_replace_chain_refuses_big_vocab(spark):
    from rusticsearch_spark.ops.bpe import load_merges_10k
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="replace-chain"):
        token_count_bpe(df, merges=load_merges_10k(), mode="expr")


# ---------------------------------------------------------------------
# lang-id breadth (VERDICT r3 #6)
# ---------------------------------------------------------------------

FIXTURES = [
    (0, "the cat was on the mat and it is this that they have", "en"),
    (1, "der hund ist nicht mit der katze auf dem dach und es", "de"),
    (2, "le chat est dans la maison et il ne dort pas sur le lit", "fr"),
    (3, "el perro es un animal que vive en la casa con los gatos", "es"),
    (4, "o gato e um animal que vive em casa com os outros", "pt"),
    (5, "de kat is een dier dat in het huis van de mensen was", "nl"),
    (6, "yang dan di itu dengan untuk tidak ini dari dalam", "id"),
    (7, "och att det som en den med var sig om har inte", "sv"),
    (8, "bir ve bu da ne var yok sen ben ama", "tr"),
    (9, "xylophone zebra quartz", "und"),
    (10, "", "und"),
]


@pytest.fixture(scope="module")
def langframe(spark):
    from rusticsearch_spark.ops.text_stats import lang_id
    df = spark.createDataFrame([(i, t) for i, t, _ in FIXTURES],
                               "doc_id long, text string")
    return {r.doc_id: r for r in lang_id(df).collect()}


def test_lang_id_detects_ten_languages(langframe):
    for i, _, want in FIXTURES:
        assert langframe[i].lang_guess == want, (i, langframe[i])


def test_lang_id_margin_and_confidence(langframe):
    for i, _, want in FIXTURES:
        r = langframe[i]
        if want == "und":
            assert r.best_hits == 0 and r.confidence == 0.0
        else:
            assert r.best_hits >= 1
            assert r.margin >= 0
            assert 0 < r.confidence <= 1.0
            assert r.total_hits >= r.best_hits


def test_lang_id_tie_breaks_alphabetically(spark):
    from rusticsearch_spark.ops.text_stats import lang_id
    # the token "de" is a stopword of es/fr/nl/pt/tr alike → 5-way
    # tie on one hit each; alphabetically first code (es) must win
    df = spark.createDataFrame([(0, "de")], "doc_id long, text string")
    r = lang_id(df).collect()[0]
    assert r.lang_guess == "es" and r.margin == 0


def test_lang_id_mixed_text_has_small_margin(spark):
    from rusticsearch_spark.ops.text_stats import lang_id
    df = spark.createDataFrame(
        [(0, "the cat und der hund the dog und die katze")],
        "doc_id long, text string")
    r = lang_id(df).collect()[0]
    assert r.lang_guess in ("en", "de")
    assert r.confidence < 0.75       # split evidence, low confidence

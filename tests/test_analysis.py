"""Analyzer goldens ported 1:1 from the reference's inline tests."""

import pytest

from rusticsearch_spark.analysis import (
    Edge, ascii_fold, ascii_folding_filter, html_to_text, lowercase_filter,
    ngram_generate, standard_tokenize,
)
from rusticsearch_spark.analysis.analyzers import (
    parse_analysis_settings, simple_analyzer, standard_analyzer,
)
from rusticsearch_spark.analysis.tokenizers import Token, ngram_tokenize


# --- standard tokenizer (standard.rs:44-91) ------------------------------

def test_standard_tokenizer():
    text = ("Up from the bowels of hell he sails, weilding a tankard "
            "of freshly brewed ale!")
    expected = ["Up", "from", "the", "bowels", "of", "hell", "he", "sails",
                "weilding", "a", "tankard", "of", "freshly", "brewed", "ale"]
    toks = standard_tokenize(text)
    assert [t.term for t in toks] == expected
    assert [t.position for t in toks] == list(range(1, 16))


def test_standard_tokenizer_cjk():
    toks = standard_tokenize("こんにちは、ハチ公！")
    assert toks == [
        Token("こ", 1), Token("ん", 2), Token("に", 3), Token("ち", 4),
        Token("は", 5), Token("ハチ", 6), Token("公", 7),
    ]


# --- ngram generator (ngram_generator.rs:118-218) ------------------------

def test_ngram():
    assert ngram_generate("hello", 2, 3) == [
        "he", "hel", "el", "ell", "ll", "llo", "lo"]


def test_ngram_left_edge():
    assert ngram_generate("hello", 2, 4, Edge.LEFT) == ["he", "hel", "hell"]


def test_ngram_right_edge():
    assert ngram_generate("hello", 2, 4, Edge.RIGHT) == ["lo", "llo", "ello"]


def test_ngram_cjk():
    assert ngram_generate("こんにちは", 2, 3) == [
        "こん", "こんに", "んに", "んにち", "にち", "にちは", "ちは"]


def test_ngram_graphemes():
    # ngram_generator.rs:163-180 — grapheme clusters with combining marks
    u = "u\u0354"
    n = "n\u030e\u0348\u0330"
    i = "i\u0319\u032e\u035a\u0326"
    c = "c\u0309\u035a"
    o = "o\u0357\u033c\u0329\u0330"
    d = "d\u0306\u0343\u0365\u0354"
    e = "e\u0301"
    word = u + n + i + c + o + d + e
    assert ngram_generate(word, 2, 3) == [
        u + n, u + n + i,
        n + i, n + i + c,
        i + c, i + c + o,
        c + o, c + o + d,
        o + d, o + d + e,
        d + e,
    ]


@pytest.mark.parametrize("word,mn,mx", [
    ("", 2, 3), ("hello", 20, 20), ("hello", 0, 0), ("hello", 20, 5)])
def test_ngram_degenerate(word, mn, mx):
    assert ngram_generate(word, mn, mx) == []


# --- ngram tokenizer (tokenizers/ngram.rs:64-127) ------------------------

def test_ngram_tokenizer():
    toks = ngram_tokenize("hello", 2, 3)
    assert toks == [Token(g, 1) for g in
                    ["he", "hel", "el", "ell", "ll", "llo", "lo"]]


def test_edgengram_tokenizer():
    assert ngram_tokenize("hello world", 2, 3, Edge.LEFT) == [
        Token("he", 1), Token("hel", 1), Token("wo", 2), Token("wor", 2)]


def test_edgengram_tokenizer_max_size():
    assert ngram_tokenize("hello", 2, 1000, Edge.LEFT) == [
        Token("he", 1), Token("hel", 1), Token("hell", 1), Token("hello", 1)]


def test_edgengram_tokenizer_right():
    assert ngram_tokenize("hello world", 2, 3, Edge.RIGHT) == [
        Token("lo", 1), Token("llo", 1), Token("ld", 2), Token("rld", 2)]


# --- filters (lowercase.rs:45-84, asciifolding.rs:49-84) -----------------

def test_lowercase_filter():
    toks = [Token("Hulk", 1), Token("SMASH", 2)]
    assert lowercase_filter(toks) == [Token("hulk", 1), Token("smash", 2)]


def test_lowercase_filter_cjk():
    toks = [Token("こんにちは", 1), Token("ハチ公", 2), Token("Test", 3)]
    assert lowercase_filter(toks) == [
        Token("こんにちは", 1), Token("ハチ公", 2), Token("test", 3)]


def test_asciifolding_simple():
    assert ascii_folding_filter([Token("Ĥéllø", 1)]) == [Token("Hello", 1)]


def test_asciifolding_hiragana_not_changed():
    toks = [Token("こんにちは", 1), Token("ハチ公", 2)]
    assert ascii_folding_filter(toks) == toks


def test_asciifolding_more():
    assert ascii_fold("Æther") == "AEther"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("Łódź") == "Lodz"
    assert ascii_fold("naïve café") == "naive cafe"
    # dakuten kana must NOT be stripped to the base kana
    assert ascii_fold("がぎぐ") == "がぎぐ"


def test_asciifolding_exotic_table_entries():
    """Codepoints with NO Unicode decomposition that Lucene's table
    maps anyway — the cases an NFKD-based fold cannot reach
    (lucene_asciifold.rs arms for ƒ, ŉ, ɖ, ɗ, quotes, brackets)."""
    assert ascii_fold("ƒ") == "f"       # ƒ LATIN SMALL F WITH HOOK
    assert ascii_fold("ŉ") == "n"       # ŉ (reference folds to n)
    assert ascii_fold("ɖ") == "d"       # ɖ D WITH TAIL
    assert ascii_fold("ɗ") == "d"       # ɗ D WITH HOOK
    assert ascii_fold("‹›") == "''"  # ‹› → apostrophes
    assert ascii_fold("❴❵") == "{}"  # ❴❵ curly ornaments
    assert ascii_fold("①") == "1"       # ① circled one
    assert ascii_fold("i⁹") == "i9"     # superscript nine


def test_asciifolding_full_table_parity():
    """Every mapped codepoint of the generated table equals a fresh,
    independent parse of the reference's Lucene table — flags drift
    if either side changes."""
    import os
    import pytest
    ref = "/root/reference/src/analysis/lucene_asciifold.rs"
    if not os.path.exists(ref):
        pytest.skip("reference tree not available")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from gen_folding_table import parse
    from rusticsearch_spark.analysis.lucene_folding import FOLD_TABLE
    fresh = parse(ref)
    assert fresh == FOLD_TABLE
    assert len(FOLD_TABLE) > 1000
    for ch, out in FOLD_TABLE.items():
        assert ascii_fold(ch) == out


# --- analyzer chains ------------------------------------------------------

def test_standard_analyzer_chain():
    a = standard_analyzer()
    assert a.terms("Ĥéllø WORLD") == ["hello", "world"]


def test_simple_analyzer():
    assert simple_analyzer().terms("Hello, World-42!") == [
        "hello", "world", "42"]


def test_parse_analysis_settings():
    settings = {
        "settings": {
            "analysis": {
                "tokenizer": {
                    "my_edge": {"type": "edgeNGram", "min_gram": 2,
                                "max_gram": 3, "side": "front"},
                },
                "filter": {
                    "my_ngram": {"type": "nGram", "min_gram": 2,
                                 "max_gram": 2},
                },
                "analyzer": {
                    "edge_an": {"type": "custom", "tokenizer": "my_edge",
                                "filter": ["lowercase"]},
                    "ng_an": {"type": "custom", "tokenizer": "standard",
                              "filter": ["lowercase", "my_ngram"]},
                },
            }
        }
    }
    reg = parse_analysis_settings(settings)
    assert reg.get("edge_an").terms("Hello") == ["he", "hel"]
    assert reg.get("ng_an").terms("abc") == ["ab", "bc"]
    with pytest.raises(KeyError):
        reg.get("nope")


def test_parse_analysis_settings_errors():
    with pytest.raises(ValueError):
        parse_analysis_settings(
            {"analysis": {"analyzer": {"x": {"tokenizer": "missing"}}}})
    with pytest.raises(ValueError):
        parse_analysis_settings(
            {"analysis": {"analyzer": {"x": {"filter": ["missing"]}}}})


# --- html strip -----------------------------------------------------------

def test_html_strip_basic():
    html = (b"<html><head><title>T</title><script>var x=1;</script></head>"
            b"<body><h1>Hello &amp; welcome</h1><p>one  two\n three</p>"
            b"<style>.a{}</style></body></html>")
    assert html_to_text(html) == "T\nHello & welcome\none two three"


def test_html_strip_deterministic():
    html = b"<p>a</p><p>b</p>"
    assert html_to_text(html) == html_to_text(html) == "a\nb"


def test_html_strip_malformed():
    # unterminated trailing tag is flushed as data by html.parser —
    # deterministic (which is the invariant that matters)
    assert html_to_text(b"<p>ok<div") == "ok<div"
    assert html_to_text("plain text") == "plain text"


def test_asciifolding_nfkd_crosscheck():
    """Independent check of the transcribed Lucene table (the re-parse
    parity test would mis-parse identically on both sides): wherever
    NFKD-minus-combining-marks yields pure ASCII, the table must
    agree — except Lucene's own documented quirks, pinned exactly:
    ǧ U+01E7 sits in Lucene's 'G' arm and ẛ U+1E9B in its 'f' arm
    (verified against /root/reference/src/analysis/lucene_asciifold.rs
    lines 462 and 517, which transcribe upstream Lucene)."""
    import unicodedata
    from rusticsearch_spark.analysis.lucene_folding import FOLD_TABLE

    LUCENE_QUIRKS = {0x01E7: "G", 0x1E9B: "f"}
    compared = 0
    for key, repl in FOLD_TABLE.items():
        ch = key if isinstance(key, str) else chr(key)
        stripped = "".join(
            c for c in unicodedata.normalize("NFKD", ch)
            if not unicodedata.combining(c))
        if stripped and stripped != ch and stripped.isascii():
            compared += 1
            want = LUCENE_QUIRKS.get(ord(ch), stripped)
            assert repl == want, (hex(ord(ch)), ch, repl, stripped)
    assert compared > 700          # the check actually covers the bulk


def test_asciifolding_pinned_goldens_nondecomposable():
    """Hand-pinned goldens for entries NFKD cannot derive (no
    decomposition): ligatures, strokes, quotes — from Lucene's
    published ASCIIFoldingFilter mappings."""
    from rusticsearch_spark.analysis.filters import ascii_fold
    for src, want in [
        ("ß", "ss"), ("Æ", "AE"), ("œ", "oe"), ("Œ", "OE"),
        ("ø", "o"), ("Ø", "O"), ("Đ", "D"), ("đ", "d"),
        # NB: the reference puts ŉ in the plain 'n' arm
        # (lucene_asciifold.rs:914) — reference parity wins here
        ("ƒ", "f"), ("ŉ", "n"), ("‘", "'"), ("’", "'"),
        # single guillemets are single-QUOTE class in Lucene
        # (lucene_asciifold.rs:2180-2181), not angle brackets
        ("“", "\""), ("”", "\""), ("‹", "'"),
        ("›", "'"), ("①", "1"), ("⓪", "0"),
        ("ı", "i"), ("Ł", "L"), ("ł", "l"), ("Þ", "TH"), ("þ", "th"),
    ]:
        assert ascii_fold(src) == want, (src, want)

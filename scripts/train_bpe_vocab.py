"""Train the shipped BPE vocabularies (10k default, 50k stress).

    python scripts/train_bpe_vocab.py [documents.parquet] [n_merges] \
        [out_path] [n_synth_words]

Deterministic: word frequencies come from the driver-generated
``documents.parquet`` (itself seeded), the trainer
(ops.bpe.train_bpe_heap — lazy-max-heap selection, output identical
to the classic scan trainer, parity pytest-pinned) is pure, and
ties break (count desc, pair lexicographic asc).  Writes the public
merges.txt shape (one "a b" pair per line, rank order) — the same
format a real public vocabulary ships in, so swapping one in is a
file copy.  No Spark needed: the corpus word-frequency table is a
driver-side Counter over a few thousand documents.

The shipped tables:
    bpe_merges_10k.txt — defaults (n=10240, 30k synth words)
    bpe_merges_50k.txt — n=51200, 200k synth words (the scale-path
        stress table: python scripts/train_bpe_vocab.py \
        /root/testdata/sf0.1/documents.parquet 51200 \
        rusticsearch_spark/ops/bpe_merges_50k.txt 200000)
"""
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from rusticsearch_spark.ops.bpe import TOKEN_RE, train_bpe_heap

def _args():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.1/documents.parquet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10240
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rusticsearch_spark", "ops", "bpe_merges_10k.txt")
    n_synth = int(sys.argv[4]) if len(sys.argv) > 4 else 30000
    return src, n, out, n_synth


# The driver-generated documents corpus has a ~31-word vocabulary —
# far too small to support a 10k-merge table (merges exhaust at ~90).
# No public vocabulary asset ships in this container (no network), so
# the trainer corpus is EXTENDED with a deterministic synthetic
# word-frequency table: pseudo-words assembled from English syllables
# plus common prefixes/suffixes, Zipf-distributed, every choice a pure
# function of md5(index).  This gives the trainer realistic
# morphology (shared stems/affixes → deep merge structure) at real
# vocabulary scale; the resulting table is a stand-in with the same
# SHAPE and size as a public vocabulary, and the merges.txt format
# means e.g. GPT-2's real merges drop in as a file copy.
_ONSETS = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
           "r", "s", "t", "v", "w", "z", "br", "ch", "cl", "cr", "dr",
           "fl", "fr", "gr", "pl", "pr", "sc", "sh", "sl", "sp", "st",
           "str", "th", "tr"]
_NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "io", "ou"]
_CODAS = ["", "b", "d", "g", "k", "l", "m", "n", "p", "r", "s", "t",
          "ck", "ct", "ld", "nd", "ng", "nt", "rd", "rk", "rm", "rt",
          "ss", "st"]
_PREFIXES = ["", "", "", "re", "un", "de", "pre", "over", "inter",
             "sub", "trans", "micro"]
_SUFFIXES = ["", "", "", "s", "ed", "ing", "er", "tion", "ment",
             "ness", "able", "ly", "ity"]


def _synth_word(i: int) -> str:
    import hashlib
    h = hashlib.md5(f"bpe-word-{i}".encode()).digest()
    n_syll = 1 + h[0] % 3
    parts = [_PREFIXES[h[1] % len(_PREFIXES)]]
    for s in range(n_syll):
        parts.append(_ONSETS[h[2 + 3 * s] % len(_ONSETS)])
        parts.append(_NUCLEI[h[3 + 3 * s] % len(_NUCLEI)])
        parts.append(_CODAS[h[4 + 3 * s] % len(_CODAS)])
    parts.append(_SUFFIXES[h[12] % len(_SUFFIXES)])
    return "".join(parts)


def synth_word_freqs(n_words: int = 30000) -> Counter:
    """Zipf-distributed deterministic pseudo-word frequency table."""
    freqs: Counter = Counter()
    for i in range(n_words):
        freqs[_synth_word(i)] += max(1, int(2 * n_words / (i + 1)))
    return freqs


def main() -> None:
    SRC, N, OUT, N_SYNTH = _args()
    t0 = time.time()
    word_re = re.compile(TOKEN_RE)
    freqs: Counter = Counter()
    tbl = pq.read_table(SRC, columns=["text"])
    for chunk in tbl.column("text").chunks:
        for t in chunk.to_pylist():
            if t:
                freqs.update(word_re.findall(t.lower()))
    n_corpus = len(freqs)
    freqs.update(synth_word_freqs(N_SYNTH))
    print(f"{n_corpus} corpus words + synthetic = {len(freqs)} distinct, "
          f"{sum(freqs.values())} total ({time.time() - t0:.1f}s)")
    merges = train_bpe_heap(dict(freqs), N)
    with open(OUT, "w") as f:
        f.write(f"# BPE merges trained by scripts/train_bpe_vocab.py\n"
                f"# source={os.path.basename(os.path.dirname(SRC))}/"
                f"{os.path.basename(SRC)} n_merges={len(merges)}\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {OUT} "
          f"({time.time() - t0:.1f}s total)")


if __name__ == "__main__":
    main()

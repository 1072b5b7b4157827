"""Scoring math: TF-IDF and BM25, with the reference's exact semantics.

Mirrors /root/reference/src/search/similarity.rs:8-34 and the
length/tf quantization in
/root/reference/src/search/backends/rocksdb/segment_builder.rs:79-103
plus the query-time decode in
/root/reference/src/search/backends/rocksdb/search/mod.rs:92-108.

Two precision modes exist throughout the engine:

* ``f32`` — numpy float32 math, matching the reference's Rust f32
  computation bit-for-bit against our oracle.  Used for the
  rank-identity test suite.
* ``f64`` — the same formulas in float64 as native Spark column
  expressions.  Used for the DuckDB-oracle-checked driver queries
  (DuckDB computes in double, so both sides agree structurally).

Constants: BM25 defaults k1=1.2, b=0.75
(/root/reference/src/search/query/term_scorer.rs:10-18).
"""

from __future__ import annotations

import numpy as np

BM25_K1 = 1.2
BM25_B = 0.75


# ---------------------------------------------------------------------------
# Length quantization (index time)
# ---------------------------------------------------------------------------

def length_byte(field_token_count: int) -> int:
    """Quantize a field token count to one byte.

    ``length = ((n as f32).sqrt() - 1.0) * 3.0`` clamped to [0, 255],
    truncated (Rust ``as u8`` saturating cast);
    segment_builder.rs:97-103.  A byte of 0 is *omitted* by the
    reference — query time then assumes length 1.0.
    """
    length = (np.sqrt(np.float32(field_token_count)) - np.float32(1.0)) * np.float32(3.0)
    if length > 255.0:
        return 255
    if length < 0.0:
        return 0
    return int(length)  # truncation


def length_from_byte(len_byte: int | None) -> np.float32:
    """Query-time decode: ``((byte/3)+1)^2``; missing/0 → 1.0.

    rocksdb/search/mod.rs:92-99 (the stored byte is only present when
    non-zero, so byte==0 is equivalent to missing).
    """
    if not len_byte:
        return np.float32(1.0)
    length_sqrt = np.float32(len_byte) / np.float32(3.0) + np.float32(1.0)
    return length_sqrt * length_sqrt


# ---------------------------------------------------------------------------
# f32 scoring (numpy, vectorized) — similarity.rs semantics
# ---------------------------------------------------------------------------

def lengths_from_bytes(len_bytes) -> np.ndarray:
    """Vectorized :func:`length_from_byte` over an int array (f32)."""
    lb = np.asarray(len_bytes, dtype=np.float32)
    sq = lb / np.float32(3.0) + np.float32(1.0)
    return np.where(lb == 0, np.float32(1.0), sq * sq).astype(np.float32)


def tf_weight_f32(term_frequency):
    """``ln(tf + 1) + 1`` in f32 (similarity.rs:8-11)."""
    tf = np.asarray(term_frequency, dtype=np.float32)
    return np.log(tf + np.float32(1.0)) + np.float32(1.0)


def idf_f32(docs_with_term, total_docs):
    """``ln((total_docs + 1)/(docs_with_term + 1)) + 1`` in f32
    (similarity.rs:14-17)."""
    n = np.float32(total_docs) + np.float32(1.0)
    d = np.asarray(docs_with_term, dtype=np.float32) + np.float32(1.0)
    return np.log(n / d) + np.float32(1.0)


def bm25_f32(term_frequency, length, total_tokens, total_docs, docs_with_term,
             k1: float = BM25_K1, b: float = BM25_B):
    """Vectorized BM25 in f32 (similarity.rs:28-34).

    ``length`` is the *decoded quantized* length (``length_from_byte``),
    and the formula uses ``sqrt(length)`` / ``sqrt(avg_length)`` where
    ``avg_length = (total_tokens + 1)/(total_docs + 1)``.
    """
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1.0)
    tfw = tf_weight_f32(term_frequency)
    idf = idf_f32(docs_with_term, total_docs)
    avg_len = (np.float32(total_tokens) + one) / (np.float32(total_docs) + one)
    length = np.asarray(length, dtype=np.float32)
    norm = k1 * ((one - b) + b * np.sqrt(length) / np.sqrt(avg_len))
    return idf * (k1 + one) * (tfw / (tfw + norm + one))


def tfidf_f32(term_frequency, total_docs, docs_with_term):
    """``tf_weight * idf`` in f32 (similarity.rs:22-27)."""
    return tf_weight_f32(term_frequency) * idf_f32(docs_with_term, total_docs)


# ---------------------------------------------------------------------------
# f64 scoring (numpy float64) — used when the engine must agree with a
# double-precision SQL oracle (DuckDB) instead of the Rust reference.
# Same formulas, same structure as the SQL strings below.
# ---------------------------------------------------------------------------

def lengths_from_bytes_f64(len_bytes) -> np.ndarray:
    lb = np.asarray(len_bytes, dtype=np.float64)
    sq = lb / 3.0 + 1.0
    return np.where(lb == 0, 1.0, sq * sq)


def bm25_f64(term_frequency, length, total_tokens, total_docs,
             docs_with_term, k1: float = BM25_K1, b: float = BM25_B):
    tfw = np.log(np.asarray(term_frequency, dtype=np.float64) + 1.0) + 1.0
    idf = np.log((float(total_docs) + 1.0)
                 / (np.asarray(docs_with_term, dtype=np.float64) + 1.0)) + 1.0
    avg_len = (float(total_tokens) + 1.0) / (float(total_docs) + 1.0)
    norm = k1 * ((1.0 - b) + b * np.sqrt(np.asarray(length, dtype=np.float64))
                 / np.sqrt(avg_len))
    return idf * (k1 + 1.0) * (tfw / (tfw + norm + 1.0))


def tfidf_f64(term_frequency, total_docs, docs_with_term):
    tfw = np.log(np.asarray(term_frequency, dtype=np.float64) + 1.0) + 1.0
    idf = np.log((float(total_docs) + 1.0)
                 / (np.asarray(docs_with_term, dtype=np.float64) + 1.0)) + 1.0
    return tfw * idf


# ---------------------------------------------------------------------------
# f64 scoring as Spark SQL expression strings (shared with the DuckDB
# oracle — both engines evaluate the identical formula text in double).
# ---------------------------------------------------------------------------

def bm25_sql(tf_col: str, len_byte_col: str, df_col: str,
             total_docs: str, total_tokens: str,
             k1: float = BM25_K1, b: float = BM25_B) -> str:
    """ANSI-SQL BM25 expression over integer tf/len_byte/df columns.

    Valid in both Spark SQL and DuckDB; all math in double precision.
    ``len_byte_col`` is the quantized byte (0 ⇒ length 1.0).
    """
    length = (
        f"(CASE WHEN {len_byte_col} = 0 THEN 1.0 "
        f"ELSE ({len_byte_col}/3.0 + 1.0) * ({len_byte_col}/3.0 + 1.0) END)"
    )
    tfw = f"(ln({tf_col} + 1.0) + 1.0)"
    idf = f"(ln(({total_docs} + 1.0) / ({df_col} + 1.0)) + 1.0)"
    avg_len = f"(({total_tokens} + 1.0) / ({total_docs} + 1.0))"
    norm = f"({k1} * ((1.0 - {b}) + {b} * sqrt({length}) / sqrt({avg_len})))"
    return f"({idf} * ({k1} + 1.0) * ({tfw} / ({tfw} + {norm} + 1.0)))"


def length_byte_sql(token_count_col: str) -> str:
    """SQL equivalent of :func:`length_byte` (double math, truncating)."""
    raw = f"((sqrt(CAST({token_count_col} AS DOUBLE)) - 1.0) * 3.0)"
    return (
        f"CAST(least(255.0, greatest(0.0, floor({raw}))) AS INT)"
    )

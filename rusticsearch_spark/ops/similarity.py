"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: one scan, all math in
  native higher-order functions (``zip_with`` + ``aggregate``) inside
  whole-stage codegen; the top-k is TakeOrderedAndProject.  This is
  the correctness baseline and is already the right plan for one-off
  queries at scale (a single pass over the corpus).
* ``ann_topk_lsh`` — the scale path for repeated queries: sign-LSH
  bucketing (deterministic, from the vector's own leading-dimension
  signs) prunes the scan to one bucket; exact cosine re-ranks inside.
  Approximate (recall < 1 across bucket boundaries) — documented
  tradeoff, verified against the brute-force baseline in tests.

All dot products cast to double before accumulating so results agree
bit-for-bit with a double-precision SQL oracle.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> Column:
    """Σ a[i]*b[i] in double, sequential accumulation."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sign_bucket_expr(vec_col: str, nbits: int = 8) -> Column:
    """LSH bucket = bits of sign(v[0..nbits)) — deterministic, cheap,
    and SQL-portable (no random hyperplanes to ship)."""
    bucket = F.lit(0)
    for i in range(nbits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) >= 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def cosine_topk(df: DataFrame, query_vec: List[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    (id, cos) rounded to 6 dp, ordered cos desc / id asc.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with_q = df.withColumn("_q", q)
    cos = (dot_expr(vec_col, "_q")
           / (norm_expr(vec_col) * norm_expr("_q")))
    return (with_q
            .select(F.col(id_col), F.round(cos, 6).alias("cos"))
            .orderBy(F.desc("cos"), F.asc(id_col))
            .limit(k))


def ann_topk_lsh(df: DataFrame, query_vec: List[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 nbits: int = 8) -> DataFrame:
    """Approximate top-k: scan only the query's sign-LSH bucket."""
    qbucket = 0
    for i in range(nbits):
        if float(query_vec[i]) >= 0:
            qbucket |= 1 << i
    pruned = df.where(sign_bucket_expr(vec_col, nbits) == qbucket)
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)

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
    and SQL-portable (no random hyperplanes to ship).

    Caveat at scale: real embedding dimensions are correlated, so
    leading-dim signs skew the bucket distribution (a few buckets
    hold most vectors).  Prefer :func:`hyperplane_bucket_expr` —
    pseudo-random ±1 hyperplanes mix every dimension into every bit.
    """
    bucket = F.lit(0)
    for i in range(nbits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) >= 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lcg_planes(nbits: int, dim: int, seed: int = 0x5DEECE66D) -> List[List[int]]:
    """Deterministic ±1 hyperplanes from a 64-bit LCG — pure-Python so
    the SAME literal coefficients can be inlined into both the Spark
    expression and an ANSI-SQL oracle (no library RNG dependency)."""
    x = seed & 0xFFFFFFFFFFFFFFFF
    planes: List[List[int]] = []
    for _ in range(nbits):
        row: List[int] = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) \
                % (1 << 64)
            row.append(1 if (x >> 63) else -1)
        planes.append(row)
    return planes


def hyperplane_bucket_expr(vec_col: str,
                           planes: List[List[int]]) -> Column:
    """Sign-LSH bucket over explicit hyperplanes: bit i =
    sign(planes[i] · v).  ±1 integer coefficients keep every product
    exact in double, so a double-precision SQL oracle computes the
    identical signs."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(float(c)) for c in plane]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.shiftleft(
            F.when(dot >= 0, 1).otherwise(0), i)
    return bucket


def hyperplane_bucket_py(vec, planes: List[List[int]]) -> int:
    """Driver-side bucket of a query vector (same math)."""
    b = 0
    for i, plane in enumerate(planes):
        dot = 0.0
        for x, c in zip(vec, plane):
            dot += float(x) * float(c)
        if dot >= 0:
            b |= 1 << i
    return b


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


def ann_topk_hyperplane(df: DataFrame, query_vec: List[float],
                        k: int = 10, id_col: str = "vec_id",
                        vec_col: str = "embedding", nbits: int = 8,
                        tables: int = 1,
                        seed: int = 0x5DEECE66D) -> DataFrame:
    """Approximate top-k with random-hyperplane sign-LSH.

    ``tables`` independent hash tables (distinct seeds) are probed and
    their candidate buckets unioned before the exact cosine re-rank —
    the standard recall lever: a true neighbour is missed only if it
    falls outside the query's bucket in EVERY table.  Per-table
    candidate sets stay bucket-sized, so the scan cost is
    ``tables × corpus/2^nbits`` instead of the full corpus.
    """
    dim = len(query_vec)
    cond = None
    for t in range(tables):
        planes = lcg_planes(nbits, dim, seed=seed + 7919 * t)
        qb = hyperplane_bucket_py(query_vec, planes)
        c = hyperplane_bucket_expr(vec_col, planes) == qb
        cond = c if cond is None else (cond | c)
    return cosine_topk(df.where(cond), query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------
# IVF-flat (coarse-quantizer inverted lists) — the other standard ANN
# shape besides LSH: assign every vector to its nearest coarse
# centroid, probe only the query's nprobe nearest lists, exact-rerank
# inside.  Centroids here are deterministic SAMPLED vectors (the
# lowest-id corpus vectors) rather than k-means iterates, so the SAME
# assignment is expressible in ANSI SQL for the oracle; swapping in
# trained centroids changes recall, not the plan shape.  At 100 TB the
# assignment is one narrow map pass and the probe scans
# nprobe/K of the corpus.
# ---------------------------------------------------------------------

def cosine_to_lit_expr(vec_col: str, vec: List[float]) -> Column:
    """cos(v, literal) — dot/(‖v‖·‖c‖), sequential double accumulation
    (‖c‖ folded to a python-double literal: same sequential sum)."""
    import math
    lit = F.array(*[F.lit(float(x)) for x in vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), lit,
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, v: acc + v)
    nc = 0.0
    for x in vec:
        nc += float(x) * float(x)
    return dot / (norm_expr(vec_col) * F.lit(math.sqrt(nc)))


def ivf_assign_expr(vec_col: str, centroids) -> Column:
    """Centroid id of the max-cosine centroid for each row; ties break
    to the LOWEST centroid id (struct array_max: cos asc then -cid)."""
    pairs = [F.struct(cosine_to_lit_expr(vec_col, vec).alias("c"),
                      F.lit(-int(cid)).alias("n"))
             for cid, vec in centroids]
    best = F.array_max(F.array(*pairs))
    return (-best["n"]).cast("long")


def cosine_py(a, b) -> float:
    """Driver-side cosine, same sequential-double formula."""
    import math
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        x, y = float(x), float(y)
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def ann_topk_ivf(df: DataFrame, query_vec: List[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroids=None, nprobe: int = 2) -> DataFrame:
    """IVF top-k: probe the ``nprobe`` centroid lists nearest the
    query, exact cosine re-rank inside the probed lists.

    ``centroids``: [(cid, vector)] — deterministic, supplied by the
    caller (sampled or trained).  A true neighbour is missed only if
    its assigned centroid is outside the query's nprobe nearest —
    recall rises with nprobe at a proportional scan cost
    (nprobe/K of the corpus)."""
    if not centroids:
        raise ValueError("centroids required")
    ranked = sorted(((cosine_py(query_vec, vec), -int(cid))
                     for cid, vec in centroids), reverse=True)
    probe = [-n for _, n in ranked[:nprobe]]
    pruned = df.where(ivf_assign_expr(vec_col, centroids).isin(probe))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)

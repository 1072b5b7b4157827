"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale notes (the point of these designs):

* exact dedup is one hash-groupBy — fully map-side combinable;
* Jaccard self-join goes through per-token pair generation; head
  tokens are the skew hazard, so ``max_df`` drops tokens present in
  more than that many docs before the join (stopword-like tokens
  carry no dedup signal anyway);
* MinHash bands turn O(n²) similarity into an equi-join on band
  buckets — the shuffle key is (band_id, band_hash), uniform by
  construction;
* all hash math uses md5-derived integers so every op has an exact
  cross-engine SQL oracle (no reliance on engine-private hash fns).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_stats import tokens_col

# md5-derived 60-bit token hash, then small-prime permutations:
# identical formula spelled in Spark and ANSI/DuckDB SQL.
_H_MOD = 1_000_003
_PERM_MOD = 999_983
_PERM_A = [37, 101, 197, 311, 419, 541, 661, 797, 919, 1049,
           1181, 1297, 1429, 1523, 1627, 1741]
_PERM_B = [71, 173, 281, 397, 503, 613, 733, 857, 977, 1091,
           1213, 1321, 1447, 1559, 1663, 1783]


def token_hash_expr(tok_col: str = "tok"):
    """60-bit integer from the md5 hex prefix, reduced mod a prime."""
    return (F.conv(F.substring(F.md5(F.col(tok_col)), 1, 15), 16, 10)
            .cast("long") % _H_MOD)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, n_dups, min id kept)."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


def _doc_tokens(df: DataFrame, id_col: str, text_col: str,
                max_df: Optional[int]) -> DataFrame:
    toks = (df.select(F.col(id_col).alias("did"),
                      F.explode(F.array_distinct(tokens_col(text_col)))
                      .alias("tok")))
    if max_df is not None:
        rare = (toks.groupBy("tok").agg(F.count("*").alias("df"))
                .where(F.col("df") <= max_df))
        toks = toks.join(rare.select("tok"), "tok")
    return toks


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.5,
                  max_df="auto") -> DataFrame:
    """Distinct-token Jaccard over all pairs via token equi-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥
    threshold, rounded to 6 dp.

    ``max_df`` is the skew guard and it is ON by default: the
    pair-generating self-join emits O(df²) rows per token, so one
    head token ("the", df ≈ corpus size) alone is quadratic in the
    corpus — a scale-killer on Zipfian text.  ``"auto"`` drops tokens
    present in more than max(20, 1% of docs) documents (one count()
    job); such tokens carry no dedup signal (they shift BOTH the
    intersection and the union of near-identical docs).  Pass an int
    to pin the cutoff (required for an exact cross-engine oracle), or
    ``None`` to force the unguarded quadratic path on small corpora.
    For large-scale near-dup detection prefer ``minhash_band_pairs``.
    """
    if max_df == "auto":
        max_df = max(20, -(-df.count() // 100))
    toks = _doc_tokens(df, id_col, text_col, max_df)
    sizes = toks.groupBy("did").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.did") < F.col("b.did")))
             .groupBy(F.col("a.did").alias("id_a"),
                      F.col("b.did").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    return (inter
            .join(sizes.withColumnRenamed("did", "id_a")
                  .withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("did", "id_b")
                  .withColumnRenamed("sz", "sz_b"), "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("inter")
                            / (F.col("sz_a") + F.col("sz_b")
                               - F.col("inter")), 6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_perm: int = 8) -> DataFrame:
    """(id, perm, sig): min over tokens of (a*h + b) mod P per
    permutation — the classic MinHash estimator of Jaccard."""
    assert num_perm <= len(_PERM_A)
    toks = _doc_tokens(df, id_col, text_col, None) \
        .withColumn("h", token_hash_expr())
    perms = F.array(*[
        F.struct(F.lit(i).alias("perm"),
                 F.lit(_PERM_A[i]).alias("a"), F.lit(_PERM_B[i]).alias("b"))
        for i in range(num_perm)])
    return (toks.select("did", "h", F.explode(perms).alias("p"))
            .select(F.col("did").alias(id_col),
                    F.col("p.perm").alias("perm"),
                    ((F.col("p.a") * F.col("h") + F.col("p.b"))
                     % _PERM_MOD).alias("hp"))
            .groupBy(id_col, "perm").agg(F.min("hp").alias("sig")))


def minhash_band_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", num_perm: int = 8,
                       band_size: int = 2) -> DataFrame:
    """LSH candidate pairs: docs sharing any full band of the MinHash
    signature.  Output (id_a, id_b) distinct, id_a < id_b."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm)
    # band key = perm-ordered signature values (array_sort on the
    # (perm, sig) struct makes the collect_list order deterministic)
    bands = (sigs
             .withColumn("band", (F.col("perm") / band_size).cast("int"))
             .groupBy(id_col, "band")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("perm", "sig"))),
                     lambda s: s.sig.cast("string")), ",").alias("key")))
    a = bands.select(F.col(id_col).alias("id_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "key")
    return (a.join(b, ["band", "key"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Connected components over a near-duplicate pair list:
    ``(doc_id, cluster_id)`` where cluster_id = the smallest doc id
    in the component (the canonical "keep this one" choice).

    Min-label propagation: every node starts as its own label; each
    round joins labels across edges (both directions) and keeps the
    minimum, until a round changes nothing.  Rounds = graph diameter;
    near-dup graphs are star/clique-shaped (a cluster of copies all
    pair with each other), so 2-3 rounds converge in practice and
    ``max_iter`` is a guard, not the expected cost.  Each round is
    one shuffle on doc_id; ``localCheckpoint`` truncates the plan so
    lineage doesn't grow linearly with rounds (the classic iterative-
    algorithm failure mode on Spark).
    """
    edges = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
             .unionByName(pairs.select(F.col(id_b).alias("u"),
                                       F.col(id_a).alias("v")))
             .distinct())
    labels = edges.select(F.col("u").alias("n")).distinct() \
        .withColumn("lbl", F.col("n"))
    edges = edges.localCheckpoint()
    for _ in range(max_iter):
        # neighbour labels: for each node, the min label among peers
        nbr = (edges.join(labels.withColumnRenamed("n", "v"), "v")
               .groupBy(F.col("u").alias("n"))
               .agg(F.min("lbl").alias("nlbl")))
        new = (labels.join(nbr, "n", "left")
               .select("n", F.least("lbl", F.coalesce("nlbl", "lbl"))
                       .alias("lbl"))).localCheckpoint()
        changed = (new.alias("a").join(labels.alias("b"), "n")
                   .where(F.col("a.lbl") != F.col("b.lbl")).count())
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("n").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))


def hash_sample(df: DataFrame, permille: int, key_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    """Deterministic corpus sampling: keep rows whose md5(salt ∥ key)
    bucket (0..999) < ``permille``.  Pure function of the key — stable
    across runs/partitions/engines (exact SQL oracle), which random()
    sampling is not; the standard way to carve reproducible train /
    eval splits from a web corpus."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          F.col(key_col).cast("string"))),
                           1, 8), 16, 10).cast("long"),
        F.lit(1000))
    return df.where(bucket < permille)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 16) -> DataFrame:
    """SimHash over distinct tokens: bit b of the fingerprint is the
    sign of Σ_tokens (±1 by token-hash bit b).  Pure SQL (explode of a
    bit sequence; no UDF)."""
    toks = _doc_tokens(df, id_col, text_col, None) \
        .withColumn("h", token_hash_expr())
    bitted = (toks
              .select("did", "h",
                      F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
                      .alias("bit"))
              .select("did", "bit",
                      (F.expr("shiftrightunsigned(h, bit)")
                       .bitwiseAND(F.lit(1)) * 2 - 1).alias("s")))
    return (bitted.groupBy("did", "bit")
            .agg(F.sum("s").alias("v"))
            .groupBy("did")
            .agg(F.sum(F.when(F.col("v") > 0,
                              F.expr("shiftleft(1L, bit)"))
                       .otherwise(0)).cast("long").alias("simhash"))
            .withColumnRenamed("did", id_col))


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        nbits: int = 8,
                        planes: Optional[list] = None) -> DataFrame:
    """Near-duplicate vectors: sign-LSH bucket join, exact cosine
    verify inside buckets.  Output (id_a, id_b, cos) with cos ≥
    threshold.  The bucket key bounds the join fan-out; at scale
    raise ``nbits`` and pass ``planes`` (random ±1 hyperplanes via
    ``similarity.lcg_planes``) — leading-dimension signs skew badly
    on real embeddings where dimensions are correlated."""
    from .similarity import (cosine_expr, hyperplane_bucket_expr,
                             sign_bucket_expr)
    bucket = (hyperplane_bucket_expr(vec_col, planes) if planes
              else sign_bucket_expr(vec_col, nbits))
    keyed = df.select(F.col(id_col).alias("did"),
                      F.col(vec_col).alias("v"),
                      bucket.alias("bkt"))
    a = keyed.select(F.col("did").alias("id_a"), F.col("v").alias("va"),
                     "bkt")
    b = keyed.select(F.col("did").alias("id_b"), F.col("v").alias("vb"),
                     "bkt")
    return (a.join(b, "bkt")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(cosine_expr("va", "vb"), 6).alias("cos"))
            .where(F.col("cos") >= threshold))

"""Materialized vector-index sidecar: ANN probes that prune file IO.

The query-time ANN paths in ``ops.similarity`` evaluate their
bucket / centroid assignment as an expression over EVERY corpus row —
compute pruning, not IO pruning: at 100 TB each ANN query is still a
full scan.  This sidecar persists the assignment once at build time
under Hive ``bucket=``/``list=`` partition directories (mirroring the
postings ``tbucket`` and doc_index ``kbucket`` patterns,
index/build.py step 4 / doc_index.py), so a probe is a
partition-pruned read of only the probed lists:

* ``lsh``        — one row per vector, ``bucket=<sign-LSH bucket>``
* ``hyperplane`` — one row per (vector, table): ``tbl=<t>/bucket=<b>``
  (the standard multi-table LSH layout: storage pays the table
  fan-out so that a probe reads exactly ``tables`` directories)
* ``ivf``        — one row per vector, ``list=<centroid id>``
  (faiss IVF-flat inverted lists; centroids stored in meta.json)

Assignments are computed with the SAME Spark expressions the
query-time paths use, so the indexed probe returns bit-identical
results to the expression path (asserted in tests) and the existing
DuckDB oracles keep passing unchanged.

The reference engine has no vectors at all — this is part of the
training-data-pipeline extension surface (SURVEY.md §2.7).
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.similarity import (cosine_py, cosine_topk, hyperplane_bucket_expr,
                              hyperplane_bucket_py, ivf_assign_expr,
                              lcg_planes, sign_bucket_expr)

_META = "meta.json"


def _assignment_rows(df: DataFrame, meta: dict):
    """(rows, partition_cols) for ``df`` under ``meta``'s assignment —
    a pure function of the vector and the frozen meta (planes/seed/
    centroids), shared by build and APPEND so later batches land in
    exactly the partitions a probe will read."""
    kind = meta["kind"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    base = df.select(F.col(id_col), F.col(vec_col))
    if kind == "lsh":
        return (base.withColumn(
            "bucket", sign_bucket_expr(vec_col, meta["nbits"])), ["bucket"])
    if kind == "hyperplane":
        per_table = []
        for t in range(meta["tables"]):
            planes = lcg_planes(meta["nbits"], meta["dim"],
                                seed=meta["seed"] + 7919 * t)
            per_table.append(base
                             .withColumn("tbl", F.lit(t))
                             .withColumn("bucket", hyperplane_bucket_expr(
                                 vec_col, planes)))
        rows = per_table[0]
        for other in per_table[1:]:
            rows = rows.unionByName(other)
        return rows, ["tbl", "bucket"]
    if kind == "ivf":
        cents = [(int(cid), vec) for cid, vec in meta["centroids"]]
        return (base.withColumn(
            "list", ivf_assign_expr(vec_col, cents)), ["list"])
    raise ValueError(f"unknown vec-index kind: {kind!r}")


def _write_rows(rows: DataFrame, parts: List[str], out_dir: str,
                shuffle_partitions: int, mode: str) -> None:
    (rows.repartition(shuffle_partitions, *[F.col(p) for p in parts])
     .write.mode(mode).partitionBy(*parts)
     .parquet(os.path.join(out_dir, "vectors")))


def build_vec_index(df: DataFrame, out_dir: str, kind: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, tables: int = 2,
                    seed: int = 0x5DEECE66D,
                    centroids: Optional[list] = None,
                    shuffle_partitions: int = 32) -> None:
    """Assign every vector once and persist (id, vector) rows under
    the assignment's Hive partitions.  One narrow shuffle on the
    partition key; at 10^9 vectors this is a single map+shuffle pass,
    after which every ANN probe is an O(corpus/buckets) read."""
    dim = len(df.select(vec_col).first()[0])
    meta = {"kind": kind, "id_col": id_col, "vec_col": vec_col,
            "dim": dim}
    if kind == "lsh":
        meta["nbits"] = nbits
    elif kind == "hyperplane":
        meta.update(nbits=nbits, tables=tables, seed=seed)
    elif kind == "ivf":
        if not centroids:
            raise ValueError("ivf index requires centroids")
        meta["centroids"] = [[int(cid), [float(x) for x in vec]]
                             for cid, vec in centroids]
    else:
        raise ValueError(f"unknown vec-index kind: {kind!r}")
    rows, parts = _assignment_rows(df, meta)
    _write_rows(rows, parts, out_dir, shuffle_partitions, "overwrite")
    tmp = os.path.join(out_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, _META))


def append_vec_index(df: DataFrame, out_dir: str,
                     shuffle_partitions: int = 32) -> None:
    """Maintenance: index a NEW batch of vectors into an existing
    sidecar without rebuilding.  The assignment is a pure function of
    the vector under the frozen meta (planes/seed/centroids never
    change post-build — the faiss IVF add() contract), so appended
    parquet files land inside the exact ``bucket=``/``list=``
    directories a probe already reads: queries see the new vectors
    with no rebuild and no reader change."""
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    rows, parts = _assignment_rows(df, meta)
    _write_rows(rows, parts, out_dir, shuffle_partitions, "append")


def compact_vec_index(spark: SparkSession, out_dir: str,
                      deleted_ids: DataFrame,
                      shuffle_partitions: int = 32) -> None:
    """Maintenance: physically drop deleted vectors (the analogue of
    the postings merge applying deletion lists, index/merge.py).  One
    anti-join rewrite of the vectors table; meta is unchanged."""
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    vec = os.path.join(out_dir, "vectors")
    # no explicit broadcast hint: AQE broadcasts small delete batches
    # itself, and a web-scale delete batch must be allowed to shuffle
    live = (spark.read.parquet(vec)
            .join(deleted_ids.select(meta["id_col"]),
                  meta["id_col"], "left_anti"))
    parts = (["tbl", "bucket"] if meta["kind"] == "hyperplane"
             else ["bucket"] if meta["kind"] == "lsh" else ["list"])
    tmp = vec + ".compact"
    (live.repartition(shuffle_partitions, *[F.col(p) for p in parts])
     .write.mode("overwrite").partitionBy(*parts).parquet(tmp))
    import shutil
    old = vec + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(vec, old)
    os.replace(tmp, vec)
    shutil.rmtree(old, ignore_errors=True)


class VecIndex:
    """Reader over a built vector-index sidecar: probe selection is
    pure driver math (the same python-side bucket/centroid functions
    the build used), the candidate read prunes to the probed
    partition directories, the exact cosine re-rank runs only inside
    them."""

    def __init__(self, out_dir: str):
        self.dir = out_dir
        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)

    @property
    def _vectors_dir(self) -> str:
        return os.path.join(self.dir, "vectors")

    def _read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._vectors_dir)

    def candidates(self, spark: SparkSession,
                   query_vec: List[float], nprobe: int = 1,
                   ) -> DataFrame:
        """Partition-pruned candidate rows for ``query_vec``.

        * lsh: the query's single sign bucket;
        * hyperplane: the query's bucket in EVERY table (recall
          lever = number of tables, fixed at build);
        * ivf: the ``nprobe`` centroid lists nearest the query.
        """
        m = self.meta
        df = self._read(spark)
        if m["kind"] == "lsh":
            qb = 0
            for i in range(m["nbits"]):
                if float(query_vec[i]) >= 0:
                    qb |= 1 << i
            return df.where(F.col("bucket") == qb)
        if m["kind"] == "hyperplane":
            cond = None
            for t in range(m["tables"]):
                planes = lcg_planes(m["nbits"], m["dim"],
                                    seed=m["seed"] + 7919 * t)
                qb = hyperplane_bucket_py(query_vec, planes)
                c = (F.col("tbl") == t) & (F.col("bucket") == qb)
                cond = c if cond is None else (cond | c)
            # a vector probed in several tables must count once
            return (df.where(cond)
                    .dropDuplicates([m["id_col"]]))
        if m["kind"] == "ivf":
            ranked = sorted(((cosine_py(query_vec, vec), -int(cid))
                             for cid, vec in m["centroids"]),
                            reverse=True)
            probe = [-n for _, n in ranked[:nprobe]]
            return df.where(F.col("list").isin(probe))
        raise ValueError(m["kind"])

    def topk(self, spark: SparkSession, query_vec: List[float],
             k: int = 10, nprobe: int = 1) -> DataFrame:
        m = self.meta
        cand = self.candidates(spark, query_vec, nprobe=nprobe)
        return cosine_topk(cand, query_vec, k,
                           id_col=m["id_col"], vec_col=m["vec_col"])


# ---------------------------------------------------------------------
# deterministic k-means trainer for IVF centroids (VERDICT r3 #7):
# hash-ordered sampled init (no RNG — resumable and seed-free), a few
# Lloyd rounds on the unit sphere (spherical k-means: assignment by
# max cosine, update = mean of unit vectors renormalized).  Each round
# is one narrow shuffle (groupBy list id over exploded dims); k and
# iters are small constants, so training is O(iters) scans — the
# sampled-centroid mode remains the SQL-oracle mode.
# ---------------------------------------------------------------------

def _normalize(vec: List[float]) -> List[float]:
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n > 0 else vec


def train_ivf_centroids(df: DataFrame, k: int, iters: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> list:
    """[(cid, centroid_vector)] — spherical k-means, deterministic.

    Init = the k vectors with the smallest xxhash64(id) (a uniform
    deterministic sample, the same trick as ops.dedup.sample_hash);
    ties impossible for distinct ids.  Empty lists keep their
    previous centroid.  Centroid ids are 0..k-1.
    """
    seeds = (df.select(id_col, vec_col)
             .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
             .limit(k).collect())
    cents = [(i, _normalize([float(x) for x in r[vec_col]]))
             for i, r in enumerate(seeds)]
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col),
            ivf_assign_expr(vec_col, cents).alias("list"))
        sums = (assigned
                .select("list", F.posexplode(F.col(vec_col))
                        .alias("pos", "x"))
                .groupBy("list", "pos")
                .agg(F.sum(F.col("x").cast("double")).alias("s"))
                .groupBy("list")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "s")))
                     .alias("ps"))
                .collect())
        new = dict(cents)
        for r in sums:
            new[int(r["list"])] = _normalize(
                [float(p["s"]) for p in r["ps"]])
        cents = sorted(new.items())
    return [(cid, vec) for cid, vec in cents]

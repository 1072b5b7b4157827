"""ANN recall-vs-probe-cost curves at scale (VERDICT r5 #7).

The driver rows prove the bucketed probes are *correct* (bit-equal
to the expression path) and *pruned* (strict-subset file reads) at
500 vectors; this script puts a NUMBER on probe quality at a scale
where buckets are actually full:

    taskset -c 0-7 python scripts/ann_recall.py [n_vectors] [out.json]

Input: the driver-generated sf0.1 embeddings table (2,000 × 64-d)
replicated to ``n_vectors`` (default 200,000) with deterministic
per-copy perturbations (pure function of (vec_id, copy) via xxhash64
— no RNG, no external data), L2-normalized.  Queries are further
small perturbations of sampled base vectors — the planted-near-
duplicate shape of dedup workloads.  Ground truth = exact brute
cosine top-10 over the full set.

Measured per configuration: mean recall@10 over the queries and the
mean candidate fraction (selectivity — the fraction of the corpus a
probe reads; the IO-cost axis the sidecar exists to shrink):

* IVF (64 trained spherical-k-means centroids): nprobe 1/2/4/8/16
* hyperplane multi-table LSH (10 bits): tables 1/2/4
* sign-LSH (8 bits): the single-bucket baseline

Writes one JSON line per configuration; docs/SCALE.md carries the
table.  tests/test_vec_index.py pins a recall floor on a smaller
deterministic instance of the same construction.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_recall.json"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 24
K = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from rusticsearch_spark.index.vec_index import (VecIndex,
                                                    build_vec_index,
                                                    train_ivf_centroids)
    from rusticsearch_spark.ops.similarity import cosine_topk

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_base = base.count()
    copies = -(-N // n_base)
    # deterministic perturbed replication: copy c of vector v adds
    # per-dimension noise derived from xxhash64(vec_id, copy, dim),
    # scaled so copies stay NEAR their source (the planted-near-dup
    # structure) but distinct; then L2-normalize.  Pure SQL.
    rep = (base.crossJoin(
        spark.range(copies).select(F.col("id").alias("copy")))
        .withColumn("vec_id",
                    (F.col("vec_id") * copies + F.col("copy"))
                    .cast("long"))
        .where(F.col("vec_id") < N))
    noise_amp = 0.15
    pert = rep.withColumn(
        "embedding",
        F.expr(f"""transform(embedding, (x, i) ->
            x + {noise_amp} * (cast(pmod(xxhash64(vec_id, i), 2001)
                               as double) / 1000.0 - 1.0))"""))
    norm = pert.withColumn(
        "nrm", F.expr("sqrt(aggregate(embedding, cast(0.0 as double),"
                      " (a, x) -> a + cast(x as double) * x))")) \
        .withColumn("embedding",
                    F.expr("transform(embedding, x ->"
                           " cast(x / nrm as float))")) \
        .select("vec_id", "embedding")
    vec_path = f"/tmp/ann_recall_vectors_{N}"
    if not os.path.exists(vec_path + "/_SUCCESS"):
        norm.repartition(16).write.mode("overwrite").parquet(vec_path)
    vecs = spark.read.parquet(vec_path)
    n = vecs.count()

    # queries: perturbed copies of every (n // N_QUERIES)-th vector
    qrows = (vecs.where(
        F.col("vec_id") % (n // N_QUERIES) == 3).limit(N_QUERIES)
        .collect())
    import hashlib
    queries = []
    for r in qrows:
        q = []
        for i, x in enumerate(r.embedding):
            h = hashlib.md5(f"q-{r.vec_id}-{i}".encode()).digest()
            q.append(float(x) + 0.05 * (h[0] / 127.5 - 1.0))
        nrm = sum(v * v for v in q) ** 0.5
        queries.append([v / nrm for v in q])

    # ground truth: exact brute-force cosine top-K
    t0 = time.time()
    truth = []
    for q in queries:
        rows = cosine_topk(vecs, q, K).collect()
        truth.append({r.vec_id for r in rows})
    brute_sec = time.time() - t0

    results = []

    def record(kind: str, cfg: dict, index_dir: str, nprobe: int = 1):
        vi = VecIndex(index_dir)
        hits = 0
        probe_sec = 0.0
        cand_frac = 0.0
        for q, t in zip(queries, truth):
            t0 = time.time()
            cand = vi.candidates(spark, q, nprobe=nprobe)
            got = {r.vec_id for r in
                   cosine_topk(cand, q, K).collect()}
            probe_sec += time.time() - t0
            hits += len(got & t)
            cand_frac += cand.count() / n
        row = {"kind": kind, **cfg, "n_vectors": n,
               "recall_at_10": round(hits / (K * len(queries)), 4),
               "cand_fraction": round(cand_frac / len(queries), 5),
               "probe_sec_per_query":
                   round(probe_sec / len(queries), 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    # IVF: trained centroids, nprobe sweep
    ivf_dir = f"/tmp/ann_recall_ivf_{N}"
    cents = train_ivf_centroids(vecs, k=64, iters=3)
    build_vec_index(vecs, ivf_dir, "ivf", centroids=cents,
                    shuffle_partitions=16)
    for nprobe in (1, 2, 4, 8, 16):
        record("ivf", {"k_lists": 64, "nprobe": nprobe}, ivf_dir,
               nprobe=nprobe)

    # hyperplane multi-table LSH: tables sweep
    for tables in (1, 2, 4):
        hp_dir = f"/tmp/ann_recall_hp_{N}_{tables}"
        build_vec_index(vecs, hp_dir, "hyperplane", nbits=10,
                        tables=tables, shuffle_partitions=16)
        record("hyperplane", {"nbits": 10, "tables": tables}, hp_dir)

    # sign-LSH single bucket
    lsh_dir = f"/tmp/ann_recall_lsh_{N}"
    build_vec_index(vecs, lsh_dir, "lsh", nbits=8,
                    shuffle_partitions=16)
    record("lsh", {"nbits": 8}, lsh_dir)

    summary = {"n_vectors": n, "n_queries": len(queries), "k": K,
               "brute_force_sec_per_query":
                   round(brute_sec / len(queries), 3),
               "results": results}
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Materialized vector-index sidecar: partition-pruned ANN probes.

The contract (VERDICT r3 #1): the indexed probe must (a) return
bit-identical results to the query-time expression path, and (b) read
a STRICT SUBSET of the sidecar's files — IO pruning, not just compute
pruning — asserted via input_file_name, the same technique as
tests/test_doc_index.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rusticsearch_spark.index.vec_index import (VecIndex, build_vec_index,
                                                train_ivf_centroids)
from rusticsearch_spark.ops.similarity import (ann_topk_hyperplane,
                                               ann_topk_ivf, ann_topk_lsh,
                                               cosine_py, cosine_topk)

DIM = 16


def _vec(rng_i: int):
    """Deterministic pseudo-random unit-ish vector (LCG, no RNG)."""
    x = (rng_i * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    out = []
    for _ in range(DIM):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(((x >> 32) / 2**31) - 1.0)   # [-1, 1)
    return out


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _vec(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.cache()


def _files_read(df, spark):
    return {r.f for r in
            df.select(F.input_file_name().alias("f")).distinct().collect()}


@pytest.mark.parametrize("kind,params", [
    ("lsh", {"nbits": 4}),
    ("hyperplane", {"nbits": 3, "tables": 2}),
])
def test_indexed_probe_matches_expression_path(spark, emb, tmp_path,
                                               kind, params):
    out = str(tmp_path / f"vidx_{kind}")
    build_vec_index(emb, out, kind, **params)
    vi = VecIndex(out)
    q = _vec(9999)
    got = vi.topk(spark, q, k=10).collect()
    if kind == "lsh":
        want = ann_topk_lsh(emb, q, k=10, nbits=params["nbits"]).collect()
    else:
        want = ann_topk_hyperplane(emb, q, k=10, **params).collect()
    assert [(r.vec_id, r.cos) for r in got] == \
        [(r.vec_id, r.cos) for r in want]


def test_ivf_indexed_matches_expression_path(spark, emb, tmp_path):
    out = str(tmp_path / "vidx_ivf")
    cents = [(i, _vec(10_000 + i)) for i in range(8)]
    build_vec_index(emb, out, "ivf", centroids=cents)
    vi = VecIndex(out)
    q = _vec(4242)
    got = vi.topk(spark, q, k=10, nprobe=2).collect()
    want = ann_topk_ivf(emb, q, k=10, centroids=cents, nprobe=2).collect()
    assert [(r.vec_id, r.cos) for r in got] == \
        [(r.vec_id, r.cos) for r in want]


def test_probe_reads_strict_subset_of_files(spark, emb, tmp_path):
    """The whole point of the sidecar: the probe's parquet scan
    touches only the probed partition directories."""
    out = str(tmp_path / "vidx_prune")
    build_vec_index(emb, out, "lsh", nbits=4)
    vi = VecIndex(out)
    all_files = _files_read(vi._read(spark), spark)
    probe_files = _files_read(vi.candidates(spark, _vec(77)), spark)
    assert probe_files, "probe read nothing"
    assert probe_files < all_files, \
        "probe did not prune file IO (read every sidecar file)"
    # and the pruning is on the partition VALUE, visible in the path
    assert all("bucket=" in f for f in probe_files)


def test_ivf_probe_prunes_lists(spark, emb, tmp_path):
    out = str(tmp_path / "vidx_ivf_prune")
    cents = [(i, _vec(10_000 + i)) for i in range(8)]
    build_vec_index(emb, out, "ivf", centroids=cents)
    vi = VecIndex(out)
    all_files = _files_read(vi._read(spark), spark)
    probe_files = _files_read(
        vi.candidates(spark, _vec(31), nprobe=2), spark)
    assert probe_files and probe_files < all_files
    lists = {f.split("list=")[1].split("/")[0] for f in probe_files}
    assert len(lists) <= 2


@pytest.mark.parametrize("kind,params", [
    ("lsh", {"nbits": 4}),
    ("hyperplane", {"nbits": 3, "tables": 2}),
    ("ivf", {}),
])
def test_maintenance_append_then_compact(spark, emb, tmp_path, kind,
                                         params):
    """Ingest-then-query through maintenance with NO manual rebuild:
    build on batch A, append batch B (new vectors must land in the
    partitions probes read — assignment is frozen-meta-pure), then
    compact away a deleted id.  After each step the indexed probe
    stays bit-identical to the expression path over the live set."""
    from rusticsearch_spark.index.vec_index import (append_vec_index,
                                                    compact_vec_index)
    if kind == "ivf":
        params = {"centroids": train_ivf_centroids(emb, k=4)}
    a = emb.where(F.col("vec_id") < 300)
    b = emb.where(F.col("vec_id") >= 300)
    out = str(tmp_path / f"maint_{kind}")
    build_vec_index(a, out, kind, **params)
    vi = VecIndex(out)
    q = _vec(9999)

    def expr_topk(live_df):
        return [(r.vec_id, round(r.cos, 9)) for r in
                cosine_topk(live_df, q, 10).collect()]

    def probe_topk():
        return [(r.vec_id, round(r.cos, 9)) for r in
                vi.topk(spark, q, k=10, nprobe=4).collect()]

    def probe_cand_ids():
        return {r.vec_id for r in
                vi.candidates(spark, q, nprobe=4).collect()}

    # 1) append: queries see batch B immediately
    append_vec_index(b, out)
    all_ids = {r.vec_id for r in
               spark.read.parquet(out + "/vectors").select("vec_id")
               .distinct().collect()}
    assert len(all_ids) == 400
    cand_after_append = probe_cand_ids()
    got = probe_topk()
    # parity with the expression path restricted to the same
    # candidate set (the probe's contract)
    want = expr_topk(emb.join(
        spark.createDataFrame([(i,) for i in cand_after_append],
                              "vec_id long"), "vec_id"))
    assert got == want
    # 2) compact: a deleted vector disappears from probes
    victim = got[0][0]
    compact_vec_index(spark, out,
                      spark.createDataFrame([(victim,)], "vec_id long"))
    assert victim not in probe_cand_ids()
    got2 = probe_topk()
    assert victim not in [i for i, _ in got2]
    want2 = expr_topk(emb.join(
        spark.createDataFrame([(i,) for i in probe_cand_ids()],
                              "vec_id long"), "vec_id"))
    assert got2 == want2


def test_trained_centroids_recall_on_planted_clusters(spark):
    """Spherical k-means on planted clusters: with nprobe=2 of k=8
    lists, recall@10 vs brute force must be ≥ 0.9 (VERDICT r3 #7)."""
    k, per = 8, 60
    anchors = [_vec(5_000 + c) for c in range(k)]
    rows = []
    for c in range(k):
        a = anchors[c]
        for j in range(per):
            jitter = _vec(6_000 + c * per + j)
            v = [ai + 0.15 * ji for ai, ji in zip(a, jitter)]
            rows.append((c * per + j, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(df, k=k, iters=3)
    assert len(cents) == k
    for _, v in cents:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    q = [ai + 0.1 * ji for ai, ji in zip(anchors[3], _vec(7_777))]
    exact = {r.vec_id for r in cosine_topk(df, q, k=10).collect()}
    approx = {r.vec_id for r in
              ann_topk_ivf(df, q, k=10, centroids=cents,
                           nprobe=2).collect()}
    assert len(exact & approx) / 10 >= 0.9


def test_sidecar_recall_floor_on_perturbed_replication(spark):
    """Small deterministic instance of the scripts/ann_recall.py
    construction (perturbed-replicated corpus, near-dup queries):
    probing the IVF sidecar at nprobe=4 of 16 lists must reach
    recall@10 ≥ 0.9 vs brute force while reading a strict minority
    of the corpus — the shape behind the docs/SCALE.md curve."""
    import tempfile

    base = [(i, _vec(i)) for i in range(100)]
    rows = []
    for i, v in base:
        for c in range(40):
            jit = _vec(100_000 + i * 40 + c)
            w = [x + 0.15 * j for x, j in zip(v, jit)]
            n = math.sqrt(sum(x * x for x in w))
            rows.append((i * 40 + c, [x / n for x in w]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()
    n = df.count()
    cents = train_ivf_centroids(df, k=16, iters=3)
    out = tempfile.mkdtemp(prefix="vecidx_recall_")
    build_vec_index(df, out, "ivf", centroids=cents,
                    shuffle_partitions=8)
    vi = VecIndex(out)
    recalls, fracs = [], []
    for qi in (7, 31, 64):
        src = dict(rows)[qi * 40 + 3]
        jit = _vec(900_000 + qi)
        q = [x + 0.05 * j for x, j in zip(src, jit)]
        exact = {r.vec_id for r in cosine_topk(df, q, k=10).collect()}
        cand = vi.candidates(spark, q, nprobe=4)
        got = {r.vec_id for r in cosine_topk(cand, q, 10).collect()}
        recalls.append(len(exact & got) / 10)
        fracs.append(cand.count() / n)
    assert sum(recalls) / len(recalls) >= 0.9
    assert max(fracs) < 0.5          # genuine pruning, not a rescan

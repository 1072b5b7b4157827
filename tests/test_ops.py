"""Training-data ops: dedup, ANN similarity, text stats, multimodal
plumbing — brute-force/numpy cross-checks (the DuckDB oracle parity
for these runs in the driver gate; see driver_queries.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()


def test_exact_duplicates_finds_planted_dup(spark, docs):
    from rusticsearch_spark.ops.dedup import exact_duplicates
    planted = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    d = exact_duplicates(docs.unionByName(planted))
    rows = d.collect()
    assert len(rows) == 3
    assert all(r.n_dups == 2 for r in rows)
    # keep_id is the original (minimum) id
    assert all(r.keep_id < 100000 for r in rows)


def test_jaccard_pairs_identical_docs_score_one(spark, docs):
    from rusticsearch_spark.ops.dedup import jaccard_pairs
    two = docs.limit(1)
    dup = two.withColumn("doc_id", F.lit(999999))
    pairs = jaccard_pairs(two.unionByName(dup), threshold=0.99).collect()
    assert len(pairs) == 1 and pairs[0].jaccard == 1.0


def test_minhash_bands_catch_exact_dup(spark, docs):
    from rusticsearch_spark.ops.dedup import minhash_band_pairs
    base = docs.limit(5)
    dup = base.limit(1).withColumn("doc_id", F.lit(999999))
    pairs = minhash_band_pairs(base.unionByName(dup)).collect()
    assert any({p.id_a, p.id_b} >= {999999} or p.id_b == 999999
               for p in pairs)


def test_simhash_stable_and_bounded(spark, docs):
    from rusticsearch_spark.ops.dedup import simhash
    a = {r.doc_id: r.simhash for r in simhash(docs, bits=16).collect()}
    b = {r.doc_id: r.simhash for r in simhash(docs, bits=16).collect()}
    assert a == b                       # deterministic
    assert all(0 <= v < (1 << 16) for v in a.values())


def test_cosine_topk_matches_numpy(spark, emb):
    from rusticsearch_spark.ops.similarity import cosine_topk
    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in rows}
    q = vecs[0]
    sims = {vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
            for vid, v in vecs.items() if vid != 0}
    want = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    got = cosine_topk(emb.where("vec_id <> 0"),
                      list(vecs[0]), k=10).collect()
    assert [g.vec_id for g in got] == [w[0] for w in want]
    np.testing.assert_allclose([g.cos for g in got],
                               [round(w[1], 6) for w in want], atol=2e-6)


def test_ann_lsh_subset_of_bucket(spark, emb):
    from rusticsearch_spark.ops.similarity import ann_topk_lsh, cosine_topk
    rows = emb.collect()
    q = list(rows[0].embedding)
    approx = ann_topk_lsh(emb.where("vec_id <> 0"), q, k=5, nbits=4).collect()
    exact = cosine_topk(emb.where("vec_id <> 0"), q, k=100).collect()
    exact_order = {r.vec_id: i for i, r in enumerate(exact)}
    # every ANN hit is a genuinely high-cosine vector (same bucket ⇒
    # leading sign bits agree with the query)
    assert all(a.vec_id in exact_order for a in approx)


def test_embedding_near_dups_planted(spark, emb):
    from rusticsearch_spark.ops.dedup import embedding_near_dups
    dup = emb.limit(1).withColumn("vec_id", F.lit(999999))
    pairs = embedding_near_dups(emb.unionByName(dup),
                                threshold=0.999).collect()
    assert any(p.id_b == 999999 and p.id_a == 0 for p in pairs)


def test_quality_and_langid_shapes(spark, docs):
    from rusticsearch_spark.ops.text_stats import lang_id, quality_score
    q = quality_score(docs).collect()
    assert len(q) == docs.count()
    assert all(0 <= r.distinct_ratio <= 1 and 0 <= r.stopword_ratio <= 1
               for r in q)
    l = {r.doc_id: r.lang_guess for r in lang_id(docs).collect()}
    assert set(l.values()) <= {"en", "es", "fr", "und"}


def test_fingerprint_detects_shared_prefix(spark, docs):
    from rusticsearch_spark.ops.text_stats import doc_fingerprint
    fp = doc_fingerprint(docs)
    dup = docs.limit(1).withColumn("doc_id", F.lit(999999))
    fp2 = doc_fingerprint(docs.unionByName(dup))
    a = {r.doc_id: r.fingerprint for r in fp2.collect()}
    assert a[999999] == a[0]            # identical text ⇒ same fingerprint


def test_multimodal_stub_pipeline(spark, webtext):
    from rusticsearch_spark.ops.multimodal import (HAVE_PIL, decode_media,
                                                   decode_media_real,
                                                   frame_sample,
                                                   media_from_webtext)
    media = media_from_webtext(webtext.limit(20))
    feats = decode_media(media).collect()
    assert len(feats) == 20
    # html payloads are not decodable images → every row takes the
    # stub path in BOTH modes (with and without a codec present)
    assert all(not f.decoded for f in feats)
    assert all(64 <= f.width <= 255 and f.n_bytes > 0 for f in feats)
    # deterministic across runs
    again = decode_media(media).collect()
    assert sorted(f.sha256 for f in feats) == sorted(f.sha256 for f in again)
    # forced stub mode is identical on the honest columns
    stub = decode_media(media, mode="stub").collect()
    assert sorted(f.sha256 for f in stub) == sorted(f.sha256 for f in feats)
    if not HAVE_PIL:
        # without a codec the real hook is an explicit stub
        with pytest.raises(NotImplementedError):
            decode_media_real(b"x", "image")
    frames = frame_sample(media.limit(2), every_n=1).collect()
    assert frames and all(f.frame_idx == 0 for f in frames)  # images: 1 frame


def test_multimodal_real_decode_when_codec_present(spark):
    """A 1×1 PNG yields true dimensions and decoded=True in EVERY
    container: Pillow when importable, else the built-in header
    parser (a real metadata decode, not the stub)."""
    from rusticsearch_spark.ops.multimodal import MEDIA_SCHEMA, decode_media
    import base64
    png_1x1 = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        b"z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    df = spark.createDataFrame([("m1", "image", bytearray(png_1x1))],
                               MEDIA_SCHEMA)
    row = decode_media(df).collect()[0]
    assert row.decoded and row.width == 1 and row.height == 1


def test_image_header_parser_goldens():
    """parse_image_dims reads true dims from PNG/BMP/GIF/JPEG headers
    and returns None for non-images (stub fallback stays reachable)."""
    import base64
    from rusticsearch_spark.ops.multimodal import (parse_image_dims,
                                                   synth_bmp)
    png_1x1 = base64.b64decode(
        b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        b"z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    assert parse_image_dims(png_1x1) == (1, 1)
    assert parse_image_dims(synth_bmp(17, 9)) == (17, 9)
    gif = (b"GIF89a" + (300).to_bytes(2, "little")
           + (200).to_bytes(2, "little") + bytes(10))
    assert parse_image_dims(gif) == (300, 200)
    # minimal JPEG: SOI, APP0 (16 bytes), SOF0 with h=7 w=5
    jpeg = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01"
            b"\x00\x01\x00\x00"
            b"\xff\xc0\x00\x11\x08" + (7).to_bytes(2, "big")
            + (5).to_bytes(2, "big") + bytes(10))
    assert parse_image_dims(jpeg) == (5, 7)
    assert parse_image_dims(b"<html>not an image</html>") is None
    assert parse_image_dims(b"") is None


def test_multimodal_synth_bmp_dims_through_pipeline(spark):
    """The driver row's shape: synthetic BMPs decode to their true
    (width, height) with decoded=True; byte size matches the BMP
    formula."""
    from rusticsearch_spark.ops.multimodal import (MEDIA_SCHEMA,
                                                   decode_media, synth_bmp)
    rows = [(str(i), "image", bytearray(synth_bmp(1 + i % 16, 1 + i % 8)))
            for i in range(40)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {int(r.media_id): r for r in decode_media(df).collect()}
    for i in range(40):
        w, h = 1 + i % 16, 1 + i % 8
        r = got[i]
        assert r.decoded and (r.width, r.height) == (w, h)
        assert r.n_bytes == 54 + h * ((w * 3 + 3) // 4 * 4)


def test_hyperplane_lsh_and_multitable_recall(spark, emb):
    """Random-hyperplane LSH: (a) buckets are better balanced than
    leading-dim sign buckets on correlated embeddings; (b) an exact
    duplicate is always found (identical vector ⇒ identical bucket in
    every table); (c) multi-table probing can only add candidates."""
    from rusticsearch_spark.ops.dedup import embedding_near_dups
    from rusticsearch_spark.ops.similarity import (
        ann_topk_hyperplane, cosine_topk, hyperplane_bucket_expr,
        hyperplane_bucket_py, lcg_planes, sign_bucket_expr)

    planes = lcg_planes(4, 64)
    # (a) bucket balance: max bucket share strictly better or equal
    hp = emb.select(hyperplane_bucket_expr("embedding", planes)
                    .alias("b")).groupBy("b").count().collect()
    sg = emb.select(sign_bucket_expr("embedding", 4)
                    .alias("b")).groupBy("b").count().collect()
    n = emb.count()
    assert max(r["count"] for r in hp) / n <= \
        max(r["count"] for r in sg) / n + 0.05

    # (b) Spark-side bucket == driver-side bucket for the same vector
    row = emb.first()
    got = emb.where(F.col("vec_id") == row.vec_id).select(
        hyperplane_bucket_expr("embedding", planes).alias("b")) \
        .collect()[0]["b"]
    assert got == hyperplane_bucket_py(list(row.embedding), planes)

    # exact duplicate always found via hyperplane buckets
    dup = emb.limit(1).withColumn("vec_id", F.lit(999999))
    pairs = embedding_near_dups(emb.unionByName(dup), threshold=0.999,
                                planes=planes).collect()
    assert any(p.id_b == 999999 and p.id_a == 0 for p in pairs)

    # (c) two tables return at least the single-table hits, and the
    # re-rank agrees with brute force on whatever it returns
    q = list(emb.first().embedding)
    brute = {r.vec_id: r.cos for r in
             cosine_topk(emb.where("vec_id <> 0"), q, k=50).collect()}
    t1 = {r.vec_id for r in ann_topk_hyperplane(
        emb.where("vec_id <> 0"), q, k=50, nbits=4, tables=1).collect()}
    t2 = {r.vec_id for r in ann_topk_hyperplane(
        emb.where("vec_id <> 0"), q, k=50, nbits=4, tables=2).collect()}
    assert len(t2 & set(brute)) >= len(t1 & set(brute))


def test_dedup_clusters_components(spark):
    """Min-label connected components: chain + clique + singleton-free
    (only docs with pairs appear), cluster_id = component min."""
    from rusticsearch_spark.ops.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (10, 12), (11, 12),    # clique {10,11,12}
         (20, 21)],                       # pair
        "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_hash_sample_deterministic_and_disjoint(spark):
    from rusticsearch_spark.ops.dedup import hash_sample
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, 100).collect()}
    b = {r.doc_id for r in hash_sample(df, 100).collect()}
    assert a == b                        # pure function of the key
    assert 120 <= len(a) <= 280          # ~10% of 2000
    # different salt → a different (roughly independent) sample
    c = {r.doc_id for r in hash_sample(df, 100, salt="eval").collect()}
    assert c != a


def test_ann_ivf_matches_bruteforce_top1_and_finds_duplicate(spark, emb):
    """IVF-flat with sampled centroids: (a) an exact duplicate vector
    is always found (identical vector ⇒ identical assignment ⇒ same
    probed list); (b) results are a subset of the corpus ranked by
    exact cosine; (c) probing ALL lists equals brute force exactly."""
    from rusticsearch_spark.ops.similarity import (ann_topk_ivf,
                                                   cosine_topk)
    qvec = list(emb.where(F.col("vec_id") == 0).first().embedding)
    cents = [(int(r.vec_id), [float(x) for x in r.embedding])
             for r in emb.where((F.col("vec_id") >= 1)
                                & (F.col("vec_id") <= 6))
             .orderBy("vec_id").collect()]
    corpus = emb.where(F.col("vec_id") != 0).select("vec_id", "embedding")
    # plant an exact duplicate of the query
    dup = spark.createDataFrame([(999999, qvec)], corpus.schema)
    full = corpus.unionByName(dup)
    got = ann_topk_ivf(full, qvec, k=5, centroids=cents, nprobe=2)
    rows = got.collect()
    assert rows[0].vec_id == 999999 and rows[0].cos == 1.0
    # nprobe = K ⇒ no pruning ⇒ identical to brute force
    all_probe = ann_topk_ivf(corpus, qvec, k=10, centroids=cents,
                             nprobe=len(cents)).collect()
    brute = cosine_topk(corpus, qvec, k=10).collect()
    assert [(r.vec_id, r.cos) for r in all_probe] == \
        [(r.vec_id, r.cos) for r in brute]

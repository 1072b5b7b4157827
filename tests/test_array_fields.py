"""Array-of-strings field values (mapping/mod.rs:192-227).

Each array item is analyzed independently and the token streams are
merged with offset positions; with tf + quantized-length storage the
observable contract is: tf = total occurrences across items, field
length = total token count across items, null items skipped.
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def array_index(spark, tmp_path_factory):
    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    rows = [
        ("k1", ["hello world", "hello spark"], ["a", "b", "a"]),
        ("k2", ["world"], ["b"]),
        ("k3", None, []),
        ("k4", ["hello hello"], None),
    ]
    docs = spark.createDataFrame(
        rows, "k string, title array<string>, tags array<string>")
    path = str(tmp_path_factory.mktemp("arr_idx") / "main")
    build_index(spark, docs, path,
                IndexConfig(key_col="k",
                            fields={"title": "simple", "tags": None},
                            n_buckets=2, tbuckets=2, shuffle_partitions=2),
                jobs=1)
    return path


def _postings(index_dir):
    import pyarrow.parquet as pq
    import glob
    from rusticsearch_spark.index.codec import decode_block
    out = {}
    for f in glob.glob(f"{index_dir}/postings/job=*/tbucket=*/*.parquet"):
        t = pq.read_table(f)
        for i in range(t.num_rows):
            row = {c: t.column(c)[i].as_py() for c in t.column_names}
            seg = row["segment"]
            d, tf, ln = decode_block(seg, row["doc_bytes"],
                                     row["tf_bytes"], row["len_bytes"])
            key = (row["field"], row["term"])
            prev = out.get(key, (np.empty(0, np.int64),) * 3)
            out[key] = (np.concatenate([prev[0], d]),
                        np.concatenate([prev[1], tf]),
                        np.concatenate([prev[2], ln]))
    return out


def test_array_tf_and_length_merge(spark, array_index):
    from rusticsearch_spark.similarity import length_byte
    docs = {r["k"]: r["doc_id"] for r in
            spark.read.parquet(f"{array_index}/docs").collect()}
    post = _postings(array_index)

    # analyzed array: "hello" appears twice across k1's two items
    d, tf, ln = post[("title", "hello")]
    got = dict(zip(d.tolist(), tf.tolist()))
    assert got[docs["k1"]] == 2
    assert got[docs["k4"]] == 2            # twice within ONE item
    # field length = total tokens across items (4 for k1)
    lens = dict(zip(d.tolist(), ln.tolist()))
    assert lens[docs["k1"]] == length_byte(4)
    assert lens[docs["k4"]] == length_byte(2)

    # plain-string array: duplicate items accumulate tf; length = count
    d, tf, ln = post[("tags", "a")]
    got = dict(zip(d.tolist(), tf.tolist()))
    assert got == {docs["k1"]: 2}
    lens = dict(zip(d.tolist(), ln.tolist()))
    assert lens[docs["k1"]] == length_byte(3)
    d, tf, _ = post[("tags", "b")]
    assert set(d.tolist()) == {docs["k1"], docs["k2"]}

    # null / empty arrays: no postings
    assert all(docs["k3"] not in p[0] for p in post.values())


def test_array_search_end_to_end(spark, array_index):
    from rusticsearch_spark.query.engine import SearchEngine
    eng = SearchEngine(spark, array_index)
    assert eng.count({"term": {"tags": "b"}}) == 2
    assert eng.count({"match": {"title": "spark"}}) == 1
    assert eng.count({"match": {"title": "hello"}}) == 2

"""ES `exists` / `missing` queries — beyond the reference's query set
(an ES-1.x staple): present = stored value non-null, and non-empty
for array fields (ES treats `[]` as missing).  `missing` is the
complement, expressed through the ordinary boolean algebra.
"""

from __future__ import annotations

import pytest

MAPPING = {"properties": {
    "a": {"type": "string", "index": "not_analyzed",
          "include_in_all": False},
    # array-valued field: stays out of _all (the _all concat takes
    # scalar strings; array fields join it element-wise only when
    # analyzed — unrelated to exists semantics)
    "tags": {"type": "string", "index": "not_analyzed",
             "include_in_all": False},
}}


@pytest.fixture(scope="module")
def exists_cluster(spark, tmp_path_factory):
    from rusticsearch_spark.cluster import Cluster
    df = spark.createDataFrame(
        [("u1", "x", ["t1", "t2"]),
         ("u2", None, []),
         ("u3", "y", None),
         ("u4", None, ["t3"])],
        "url string, a string, tags array<string>")
    c = Cluster(spark, str(tmp_path_factory.mktemp("exists") / "cl"))
    c.create_index("docs", MAPPING, key_col="url")
    c.bulk("docs", df, key_col="url", n_buckets=2, tbuckets=2,
           shuffle_partitions=4)
    return c


def _ids(c, q):
    return {h["key"] for h in c.search("docs", q, size=10)}


def test_exists_and_missing_semantics(exists_cluster):
    c = exists_cluster
    assert _ids(c, {"exists": {"field": "a"}}) == {"u1", "u3"}
    assert _ids(c, {"missing": {"field": "a"}}) == {"u2", "u4"}
    # empty array IS missing; null array is missing
    assert _ids(c, {"exists": {"field": "tags"}}) == {"u1", "u4"}
    assert _ids(c, {"missing": {"field": "tags"}}) == {"u2", "u3"}
    # composition through the boolean algebra
    assert _ids(c, {"and": [{"exists": {"field": "a"}},
                            {"exists": {"field": "tags"}}]}) == {"u1"}
    assert _ids(c, {"filtered": {
        "query": {"exists": {"field": "tags"}},
        "filter": {"not": {"missing": {"field": "a"}}}}}) == {"u1"}
    # unknown / never-stored field matches nothing; missing(it) = all
    assert _ids(c, {"exists": {"field": "zzz"}}) == set()
    assert c.count("docs", {"missing": {"field": "zzz"}}) == 4
    # counts
    assert c.count("docs", {"exists": {"field": "tags"}}) == 2


def test_exists_scoring_and_parse_errors(exists_cluster):
    from rusticsearch_spark.query import dsl
    eng = exists_cluster.engine("docs")
    hits = eng.hits({"exists": {"field": "a"}}, size=10)
    assert {h["score"] for h in hits} == {1.0}   # constant score
    with pytest.raises(dsl.QueryParseError, match="string 'field'"):
        eng.parse({"exists": {}})
    with pytest.raises(dsl.QueryParseError, match="string 'field'"):
        eng.parse({"missing": {"field": 3}})


def test_exists_local_matches_spark(spark, exists_cluster):
    from rusticsearch_spark.query.engine import SearchEngine
    from rusticsearch_spark.query.local import LocalSearcher
    idx = exists_cluster._dir("docs")
    seng = SearchEngine(spark, idx, mode="spark")
    ls = LocalSearcher(idx)
    for q in ({"exists": {"field": "a"}},
              {"missing": {"field": "a"}},
              {"exists": {"field": "tags"}},
              {"missing": {"field": "tags"}},
              {"exists": {"field": "zzz"}},
              {"and": [{"exists": {"field": "a"}},
                       {"exists": {"field": "tags"}}]}):
        want = [(r.doc_id, r.score)
                for r in seng.search(q, size=10).collect()]
        assert ls.search(q, size=10) == want, q
        assert ls.count(q) == seng.count(q), q


def test_exists_on_nested_children(spark, tmp_path):
    """exists inside a `nested` query ranges over the path's child
    rows; a flat exists on a nested subfield matches no parent."""
    from rusticsearch_spark.cluster import Cluster
    mapping = {"properties": {
        "comments": {"type": "nested", "properties": {
            "note": {"type": "string", "index": "not_analyzed"}}}}}
    df = spark.createDataFrame(
        [("u1", [("hi",), (None,)]), ("u2", [(None,)]), ("u3", [])],
        "url string, comments array<struct<note:string>>")
    c = Cluster(spark, str(tmp_path / "ne"))
    c.create_index("docs", mapping, key_col="url")
    c.bulk("docs", df, key_col="url", n_buckets=2, tbuckets=2,
           shuffle_partitions=4)
    q = {"nested": {"path": "comments",
                    "query": {"exists": {"field": "comments.note"}}}}
    assert {h["key"] for h in c.search("docs", q, size=10)} == {"u1"}
    assert c.count("docs", {"exists": {"field": "comments.note"}}) == 0
    qm = {"nested": {"path": "comments", "query":
          {"missing": {"field": "comments.note"}}}}
    assert {h["key"] for h in c.search("docs", qm, size=10)} == \
        {"u1", "u2"}


def test_exists_whitespace_string_is_present_pinned(spark, tmp_path):
    """PINNED DIVERGENCE (review follow-up): `exists` here is
    STORED-value presence, so an analyzed string holding only
    whitespace (non-null stored value, zero indexed tokens) counts
    as present — ES, which checks indexed tokens, would say false.
    This test pins the documented choice so any future change is
    deliberate."""
    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    from rusticsearch_spark.query.engine import SearchEngine
    df = spark.createDataFrame(
        [("u1", "   "), ("u2", "real text"), ("u3", None)],
        "url string, text string")
    path = str(tmp_path / "ws_exists")
    build_index(spark, df, path,
                IndexConfig(key_col="url", fields={"text": "standard"},
                            n_buckets=2, tbuckets=2,
                            shuffle_partitions=2))
    eng = SearchEngine(spark, path)
    got = {r.doc_id for r in
           eng.search({"exists": {"field": "text"}}, size=10).collect()}
    docs = {r.url: r.doc_id for r in
            eng.docs.selectExpr("url", "doc_id").collect()}
    assert docs["u1"] in got        # whitespace-only: present (ours)
    assert docs["u2"] in got
    assert docs["u3"] not in got    # null: missing (both semantics)

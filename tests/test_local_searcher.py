"""LocalSearcher (driver-side serving tier) must be rank-identical to
the same oracle that pins the Spark engine — same index artifact,
same f32 scores, millisecond latency."""

import time

import numpy as np
import pytest

from rusticsearch_spark.query.local import LocalSearcher

from test_search_rank_identity import QUERIES


@pytest.fixture(scope="module")
def local(index_dir):
    return LocalSearcher(index_dir)


@pytest.mark.parametrize("name,query", QUERIES, ids=[q[0] for q in QUERIES])
def test_local_topk_rank_identity(local, oracle, name, query):
    got = local.search(query, size=10)
    want = oracle.search(local.parse(query), k=10)
    assert [g[0] for g in got] == [w[0] for w in want], name
    if want:
        np.testing.assert_allclose([g[1] for g in got],
                                   [w[1] for w in want],
                                   rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("name,query", QUERIES, ids=[q[0] for q in QUERIES])
def test_local_count(local, oracle, name, query):
    assert local.count(query) == oracle.count(local.parse(query))


def test_local_pagination(local, oracle):
    q = {"match": {"text": "spark query"}}
    full = oracle.search(local.parse(q), k=20)
    assert [h[0] for h in local.search(q, size=5, from_=5)] == \
        [w[0] for w in full[5:10]]


def test_local_latency_single_digit_ms(local):
    """The serving-tier claim: warm top-10 answers in milliseconds
    (the reference is an in-process server; this is our equivalent)."""
    q = {"match": {"text": "spark query"}}
    local.search(q, size=10)                      # warm
    t0 = time.perf_counter()
    for _ in range(20):
        local.search(q, size=10)
    per_query = (time.perf_counter() - t0) / 20
    assert per_query < 0.05, f"{per_query * 1e3:.1f}ms per query"


def test_lazy_searcher_identical_and_on_demand(index_dir, local):
    """lazy=True must return byte-identical results to the eager
    searcher for every query class — including the dictionary
    enumerations (prefix/wildcard/fuzzy), which must range over the
    FULL key set, not the decode cache — while decoding only the
    terms a query touches."""
    lz = LocalSearcher(index_dir, lazy=True)
    assert lz._key_blocks is not None and len(lz._post) == 0
    q = {"term": {"text": "merge"}}
    got = lz.search(q, size=10)
    # decoded exactly the touched term, nothing else
    assert set(lz._post) == {("text", "merge")}
    assert got == local.search(q, size=10)
    extra = [("wildcard_lead", {"wildcard": {"text": "*ark"}}),
             ("prefix", {"prefix": {"text": "sc"}}),
             ("fuzzy", {"fuzzy": {"text": {"value": "part",
                                           "fuzziness": 1}}})]
    for name, q in QUERIES + extra:
        assert lz.search(q, size=10) == local.search(q, size=10), name
        assert lz.count(q) == local.count(q), name
    # repeated queries hit the cache (same arrays, no growth)
    n_cached = len(lz._post)
    lz.search({"term": {"text": "merge"}}, size=10)
    assert len(lz._post) == n_cached


@pytest.fixture(scope="module")
def multijob_index(spark, webtext, tmp_path_factory):
    """A 3-job index (disjoint bucket ranges) — the document-sharding
    unit for ShardedSearcher."""
    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    path = str(tmp_path_factory.mktemp("sharded") / "idx")
    build_index(spark, webtext, path,
                IndexConfig(key_col="url",
                            fields={"text": "standard", "lang": None},
                            n_buckets=6, tbuckets=2,
                            shuffle_partitions=4),
                jobs=3)
    return path


def test_sharded_searcher_rank_identical(multijob_index):
    """Per-shard top-k merge == unsharded searcher, for every query
    class (incl. MultiTerm selectors, whose Avg divisor must stay
    GLOBAL under sharding)."""
    from rusticsearch_spark.query.local import ShardedSearcher
    whole = LocalSearcher(multijob_index)
    sharded = ShardedSearcher(multijob_index)
    assert len(sharded.shards) == 3
    extra = [("wildcard_lead", {"wildcard": {"text": "*ark"}}),
             ("fuzzy", {"fuzzy": {"text": {"value": "part",
                                           "fuzziness": 2}}}),
             ("prefix", {"prefix": {"text": "s"}})]
    for name, q in list(QUERIES) + extra:
        a = whole.search(q, size=10)
        b = sharded.search(q, size=10)
        assert [x[0] for x in a] == [x[0] for x in b], name
        np.testing.assert_allclose([x[1] for x in a], [x[1] for x in b],
                                   rtol=0, atol=0, err_msg=name)
        assert whole.count(q) == sharded.count(q), name
    assert whole.count() == sharded.count()
    # pagination through a shard boundary
    q = {"match": {"text": "spark query"}}
    full = whole.search(q, size=20)
    assert sharded.search(q, size=5, from_=5) == full[5:10]


def test_sharded_lazy_matches_eager(multijob_index):
    """lazy passes through sharding: per-shard on-demand decode must
    not change the merged global top-k."""
    from rusticsearch_spark.query.local import ShardedSearcher
    eager = ShardedSearcher(multijob_index)
    lz = ShardedSearcher(multijob_index, lazy=True)
    for q in [{"match": {"text": "spark query"}},
              {"prefix": {"text": "sc"}},
              {"filtered": {"query": {"match": {"text": "hash join"}},
                            "filter": {"term": {"lang": "en"}}}}]:
        assert lz.search(q, size=10) == eager.search(q, size=10)
        assert lz.count(q) == eager.count(q)


def test_engine_auto_mode_picks_sharded(spark, multijob_index, monkeypatch):
    """auto mode: whole index over the cutoff but every shard under
    it → sharded serving, same results as spark mode."""
    from rusticsearch_spark.query.engine import SearchEngine
    from rusticsearch_spark.query.local import ShardedSearcher
    probe = SearchEngine(spark, multijob_index, mode="spark")
    per_job = probe._postings_bytes_per_job()
    assert len(per_job) == 3
    cutoff = max(per_job.values()) + 1          # shard fits, total won't
    assert sum(per_job.values()) > cutoff
    monkeypatch.setattr(SearchEngine, "LOCAL_MAX_BYTES", cutoff)
    eng = SearchEngine(spark, multijob_index, mode="auto")
    assert eng.mode == "sharded"
    assert isinstance(eng._local, ShardedSearcher)
    q = {"match": {"text": "table scan"}}
    a = [(r.doc_id, round(r.score, 5)) for r in
         eng.search(q, size=10).collect()]
    b = [(r.doc_id, round(r.score, 5)) for r in
         probe.search(q, size=10).collect()]
    assert a == b and len(a) > 0
    assert eng.count(q) == probe.count(q)


def test_auto_mode_lazy_widens_cutoff(spark, multijob_index,
                                      monkeypatch):
    """serving_lazy=True keeps shards compressed in memory, so the
    auto cutoff admits LAZY_BYTES_FACTOR x more bytes: at a cutoff
    where eager auto falls back to spark, lazy auto still serves
    driver-side — with identical results."""
    from rusticsearch_spark.query.engine import SearchEngine
    probe = SearchEngine(spark, multijob_index, mode="spark")
    per_job = probe._postings_bytes_per_job()
    # below every shard: eager auto → spark; lazy (4×) → still local
    # tier as long as 4×cutoff ≥ the deciding size
    cutoff = max(per_job.values()) - 1
    assert cutoff * SearchEngine.LAZY_BYTES_FACTOR \
        >= sum(per_job.values())
    monkeypatch.setattr(SearchEngine, "LOCAL_MAX_BYTES", cutoff)
    eager = SearchEngine(spark, multijob_index, mode="auto")
    assert eager.mode == "spark"
    lz = SearchEngine(spark, multijob_index, mode="auto",
                      serving_lazy=True)
    assert lz.mode in ("local", "sharded")
    assert lz._local is not None
    q = {"match": {"text": "table scan"}}
    a = [(r.doc_id, round(r.score, 5)) for r in
         lz.search(q, size=10).collect()]
    b = [(r.doc_id, round(r.score, 5)) for r in
         probe.search(q, size=10).collect()]
    assert a == b and len(a) > 0


def test_local_sees_deletions(spark, index_dir, tmp_path, oracle):
    import shutil

    from rusticsearch_spark.index.delete import delete_documents
    path = str(tmp_path / "ldel")
    shutil.copytree(index_dir, path)
    base = LocalSearcher(path)
    victim = base.search({"match": {"text": "merge"}}, size=1)[0][0]
    delete_documents(spark, path, doc_ids=[victim])
    l2 = LocalSearcher(path)
    assert l2.count() == base.count() - 1
    assert victim not in [d for d, _ in
                          l2.search({"match": {"text": "merge"}}, size=50)]


def test_engine_local_mode_matches_spark_mode(spark, index_dir):
    """Engine(mode='local') must return the identical top-k frame as
    the distributed planner on the same index (VERDICT r3 #8), and
    'auto' must pick local below the size cutoff."""
    from rusticsearch_spark.query.engine import SearchEngine
    dist = SearchEngine(spark, index_dir)
    loc = SearchEngine(spark, index_dir, mode="local")
    assert loc.mode == "local" and loc._local is not None
    for q in [{"match": {"text": "spark query"}},
              {"term": {"text": "merge"}},
              {"filtered": {"query": {"match": {"text": "table scan"}},
                            "filter": {"term": {"lang": "en"}}}},
              {"match_all": {}}]:
        a = [(r.doc_id, round(r.score, 5)) for r in
             dist.search(q, size=12).collect()]
        b = [(r.doc_id, round(r.score, 5)) for r in
             loc.search(q, size=12).collect()]
        assert a == b, q
        assert dist.count(q) == loc.count(q)
    auto = SearchEngine(spark, index_dir, mode="auto")
    assert auto.mode == "local"      # test index ≪ 256 MB
    import pytest
    with pytest.raises(ValueError, match="f32"):
        SearchEngine(spark, index_dir, precision="f64", mode="local")
    # serving_lazy passthrough: identical hits, decode-on-demand cache
    lzy = SearchEngine(spark, index_dir, mode="local",
                       serving_lazy=True)
    assert lzy._local._key_blocks is not None
    q = {"match": {"text": "spark query"}}
    assert ([(r.doc_id, round(r.score, 5)) for r in
             lzy.search(q, size=12).collect()]
            == [(r.doc_id, round(r.score, 5)) for r in
                loc.search(q, size=12).collect()])


def test_local_selector_queries_match_engine(spark, index_dir):
    """Wildcard/regexp/fuzzy parity: LocalSearcher vs the distributed
    planner, ids AND scores (both are f32-exact)."""
    from rusticsearch_spark.query.engine import SearchEngine
    from rusticsearch_spark.query.local import LocalSearcher
    dist = SearchEngine(spark, index_dir)
    loc = LocalSearcher(index_dir)
    for q in [{"wildcard": {"text": "s*a*"}},
              {"regexp": {"text": "m[ae]r.*"}},
              {"fuzzy": {"text": {"value": "part", "fuzziness": 2}}}]:
        a = [(r.doc_id, round(r.score, 5)) for r in
             dist.search(q, size=15).collect()]
        b = [(d, round(s, 5)) for d, s in loc.search(q, size=15)]
        assert a == b and len(a) > 0, q


def test_cluster_serving_mode_auto(spark, webtext, tmp_path):
    """Cluster(serving_mode='auto') serves a small index locally and
    returns the same hits as the default Spark-planned cluster."""
    from rusticsearch_spark.cluster import Cluster
    kw = dict(key_col="url", n_buckets=4, tbuckets=2,
              shuffle_partitions=4)
    mapping = {"properties": {
        "text": {"type": "string"},
        "lang": {"type": "string", "index": "not_analyzed"}}}
    docs = webtext.select("url", "text", "lang").limit(30)
    a = Cluster(spark, str(tmp_path / "ca"))
    a.create_index("p", mapping, key_col="url")
    a.bulk("p", docs, **kw)
    b = Cluster(spark, str(tmp_path / "cb"), serving_mode="auto")
    b.create_index("p", mapping, key_col="url")
    b.bulk("p", docs, **kw)
    assert b.engine("p").mode == "local"
    q = {"match": {"text": "table scan"}}
    ha = [(h["key"], round(h["score"], 5)) for h in a.search("p", q, size=5)]
    hb = [(h["key"], round(h["score"], 5)) for h in b.search("p", q, size=5)]
    assert ha == hb and len(ha) > 0
    assert a.count("p", q) == b.count("p", q)


def test_local_filter_or_with_match_all_is_identity(local):
    """Regression: the or/max-with-All completion paths must emit
    SORTED frames — _in_sorted binary-searches docsets, so an
    unsorted filter docset silently dropped matching docs.  A filter
    that is semantically match-all must not change results."""
    plain = {"match": {"text": "spark query"}}
    for filt in (
            {"or": [{"match_all": {}}, {"term": {"lang": "en"}}]},
            {"dis_max": {"queries": [{"match_all": {}},
                                     {"term": {"lang": "en"}}]}}):
        q = {"filtered": {"query": plain, "filter": filt}}
        assert local.search(q, size=10) == local.search(plain, size=10)
        assert local.count(q) == local.count(plain)


@pytest.fixture(scope="module")
def sixteen_job_index(spark, webtext, tmp_path_factory):
    """A 16-job artifact — the VERDICT r6 #7 shard-count scale shape
    (ShardedSearcher had only ever served 2-3 shards)."""
    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    path = str(tmp_path_factory.mktemp("sharded16") / "idx")
    build_index(spark, webtext.limit(120), path,
                IndexConfig(key_col="url",
                            fields={"text": "standard", "lang": None},
                            n_buckets=64, tbuckets=2,
                            shuffle_partitions=4),
                jobs=16, parallel=2)
    return path


def test_sharded_searcher_16_shards_rank_identical(sixteen_job_index):
    """16-way merge == unsharded searcher: rank identity, counts and
    pagination hold at the shard count a real serving tier runs."""
    from rusticsearch_spark.index.layout import IndexLayout
    from rusticsearch_spark.query.local import ShardedSearcher
    jobs = IndexLayout(sixteen_job_index).completed_jobs_local()
    assert len(jobs) == 16
    whole = LocalSearcher(sixteen_job_index)
    sharded = ShardedSearcher(sixteen_job_index, lazy=True)
    assert len(sharded.shards) == 16
    for name, q in QUERIES:
        a = whole.search(q, size=10)
        b = sharded.search(q, size=10)
        assert a == b, name
        assert whole.count(q) == sharded.count(q), name
    assert whole.count() == sharded.count()
    q = {"match": {"text": "spark query"}}
    full = whole.search(q, size=20)
    assert sharded.search(q, size=5, from_=5) == full[5:10]

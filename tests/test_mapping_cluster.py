"""Mapping parsing (mapping/parse.rs + build.rs test analogues),
_all field semantics, and the cluster name/alias registry
(name_registry.rs:18-150)."""

import pytest
from pyspark.sql import functions as F

from rusticsearch_spark.cluster import Cluster, NameRegistry, NameRegistryError
from rusticsearch_spark.mapping import (FieldMapping, MappingParseError,
                                        mapping_to_config, parse_mapping,
                                        prepare_docs)

MAPPING = {
    "properties": {
        "title": {"type": "string", "analyzer": "standard", "boost": 2.0},
        "tag": {"type": "string", "index": "not_analyzed"},
        "views": {"type": "integer"},
        "published": {"type": "boolean", "store": True},
        "hidden": {"type": "string", "include_in_all": False},
    }
}


def test_parse_mapping_types_and_flags():
    fields = {f.name: f for f in parse_mapping(MAPPING)}
    assert fields["title"].is_analyzed and fields["title"].analyzer == \
        "standard" and fields["title"].boost == 2.0
    assert not fields["tag"].is_analyzed           # not_analyzed → raw term
    assert not fields["views"].is_analyzed         # integer → exact term
    assert fields["published"].store
    # _all membership: strings only, include_in_all honored
    assert fields["title"].include_in_all
    assert fields["tag"].include_in_all
    assert not fields["views"].include_in_all
    assert not fields["hidden"].include_in_all


def test_parse_mapping_analyzer_precedence():
    # per side: specific key > base "analyzer" > default
    # (mapping/build.rs:40-82: index_analyzer overrides the base
    # analyzer for the index side, search_analyzer for the query side)
    fields = parse_mapping({"properties": {
        "a": {"type": "string", "analyzer": "x", "index_analyzer": "y"},
        "b": {"type": "string", "index_analyzer": "y"},
        "c": {"type": "string"},
        "d": {"type": "string", "analyzer": "x",
              "search_analyzer": "z"},
    }}, default_analyzer="std")
    by = {f.name: f.analyzer for f in fields}
    assert by == {"a": "y", "b": "y", "c": "std", "d": "x"}
    sa = {f.name: f.search_analyzer for f in fields}
    # a: search side falls back to base "x" (differs from index "y");
    # b: search side falls back to the DEFAULT (differs from "y")
    assert sa == {"a": "x", "b": "std", "c": None, "d": "z"}


def test_parse_mapping_rejects_unknown_type():
    with pytest.raises(MappingParseError):
        parse_mapping({"properties": {"x": {"type": "geo_point"}}})
    with pytest.raises(MappingParseError):
        parse_mapping({"properties": {}})


def test_mapping_to_config_adds_all_field():
    cfg = mapping_to_config(parse_mapping(MAPPING), key_col="url")
    assert cfg.fields["_all"] == "standard"
    assert cfg.fields["tag"] is None
    assert cfg.fields["views"] is None
    assert cfg.stored == ["published"]


def test_prepare_docs_synthesizes_all_and_strings(spark):
    df = spark.createDataFrame(
        [("u1", "Hello World", "news", 7, True, "secret")],
        "url string, title string, tag string, views int, "
        "published boolean, hidden string")
    out = prepare_docs(df, parse_mapping(MAPPING)).first()
    assert out.views == "7"
    assert out.published == "true"
    # _all: include_in_all strings joined with a single space,
    # mapping order (document.rs:100-118)
    assert out._all == "Hello World news"


def test_name_registry_semantics():
    reg = NameRegistry()
    reg.insert_index("idx1")
    reg.insert_index("idx2")
    with pytest.raises(NameRegistryError):
        reg.insert_index("idx1")               # duplicate
    reg.put_alias("al", "idx1")
    reg.put_alias("al", "idx2")                # alias spans 2 indices
    with pytest.raises(NameRegistryError):
        reg.insert_index("al")                 # name collides with alias
    with pytest.raises(NameRegistryError):
        reg.put_alias("idx2", "idx1")          # alias collides with index
    assert reg.resolve("al") == ["idx1", "idx2"]
    assert reg.resolve("idx1") == ["idx1"]
    reg.delete_alias("al", "idx2")
    assert reg.resolve("al") == ["idx1"]
    reg.delete_index("idx1")
    with pytest.raises(NameRegistryError):
        reg.resolve("al")                      # empty alias gone


def test_cluster_end_to_end(spark, webtext, tmp_path):
    cluster = Cluster(spark, str(tmp_path / "cluster"))
    mapping = {"properties": {
        "text": {"type": "string"},
        "lang": {"type": "string", "index": "not_analyzed"},
    }}
    cluster.create_index("pages", mapping, key_col="url")
    cluster.bulk("pages", webtext.select("url", "text", "lang").limit(60),
                 key_col="url", n_buckets=4, tbuckets=2,
                 shuffle_partitions=4)
    cluster.put_alias("web", "pages")

    hits = cluster.search("web", {"match": {"text": "spark"}}, size=5)
    assert hits and all(h["_index"] == "pages" for h in hits)
    assert cluster.count("web") == 60
    assert cluster.count("pages", {"term": {"lang": "en"}}) > 0

    # _all field: match with no explicit field routing
    all_hits = cluster.search("web", {"match": {"_all": "spark"}}, size=5)
    assert all_hits

    cluster.delete_index("pages")
    with pytest.raises(NameRegistryError):
        cluster.count("web")


def test_search_analyzer_distinct_from_index_analyzer(spark, tmp_path):
    """mapping/mod.rs:161-166 via match_query.rs:36-44: edge-ngram
    INDEX analyzer + plain SEARCH analyzer (autocomplete).  The query
    text must be analyzed with the search analyzer only — if it went
    through the index analyzer, 'spar' would expand to s/sp/spa/spar
    and match every document."""
    from rusticsearch_spark.cluster import Cluster
    settings = {"analysis": {
        "filter": {"eg": {"type": "edge_ngram",
                          "min_gram": 1, "max_gram": 10}},
        "analyzer": {"autocomplete": {
            "type": "custom", "tokenizer": "standard",
            "filter": ["lowercase", "eg"]}},
    }}
    docs = spark.createDataFrame(
        [("a", "Spark engine"), ("b", "sparse matrix"), ("c", "postgres")],
        "k string, name string")
    c = Cluster(spark, str(tmp_path / "cl_sa"))
    c.create_index("items", {"properties": {
        "name": {"type": "string", "index_analyzer": "autocomplete",
                 "search_analyzer": "standard"}}}, key_col="k")
    c.bulk("items", docs, key_col="k", n_buckets=2, tbuckets=2,
           shuffle_partitions=2, with_all=False,
           analysis_settings=settings)
    got = {h["key"] for h in c.search(
        "items", {"match": {"name": "spar"}}, size=10)}
    assert got == {"a", "b"}
    # full-word search still works through the same override
    assert c.count("items", {"match": {"name": "postgres"}}) == 1


def test_index_no_field_not_searchable(spark, tmp_path):
    """index:'no' → is_indexed=false (mod.rs:87): the field is stored
    but carries no postings and rejects queries."""
    from rusticsearch_spark.cluster import Cluster
    from rusticsearch_spark.query.dsl import QueryParseError
    import pytest as _pytest
    docs = spark.createDataFrame(
        [("a", "hello", "secret")], "k string, body string, raw string")
    c = Cluster(spark, str(tmp_path / "cl_no"))
    c.create_index("pages", {"properties": {
        "body": {"type": "string"},
        "raw": {"type": "string", "index": "no", "store": True}}},
        key_col="k")
    c.bulk("pages", docs, key_col="k", n_buckets=2, tbuckets=2,
           shuffle_partitions=2)
    with _pytest.raises(QueryParseError):
        c.search("pages", {"term": {"raw": "secret"}})
    assert c.count("pages", {"match": {"body": "hello"}}) == 1


def test_search_fields_param_returns_stored_values(spark, tmp_path):
    """The `fields` URL parameter (search_api.rs:93-105,125-137):
    requested stored fields come back per hit as singleton lists,
    unknown names are skipped."""
    from rusticsearch_spark.cluster import Cluster
    docs = spark.createDataFrame(
        [("a", "hello world", "en", 5), ("b", "hello there", None, 7)],
        "k string, body string, lang string, rank long")
    c = Cluster(spark, str(tmp_path / "cl_fields"))
    c.create_index("pages", {"properties": {
        "body": {"type": "string"},
        "lang": {"type": "string", "index": "not_analyzed"},
        "rank": {"type": "integer", "store": True}}}, key_col="k")
    c.bulk("pages", docs, key_col="k", n_buckets=2, tbuckets=2,
           shuffle_partitions=2)
    hits = c.search("pages", {"match": {"body": "hello"}}, size=10,
                    fields=["lang", "rank", "nope"])
    by_key = {h["key"]: h["fields"] for h in hits}
    assert by_key["a"] == {"lang": ["en"], "rank": ["5"]}
    assert by_key["b"] == {"lang": [], "rank": ["7"]}   # null → []
    # without the param no fields dict is attached
    assert "fields" not in c.search(
        "pages", {"match": {"body": "hello"}}, size=1)[0]


def test_alias_merge_ordering_contract(spark, tmp_path):
    """Cross-index alias merge orders by (score desc, index name asc,
    doc_id asc) — the engine contract extended deterministically; two
    indexes holding identical content must interleave by index name."""
    from rusticsearch_spark.cluster import Cluster
    c = Cluster(spark, str(tmp_path / "cl_tie"))
    mapping = {"properties": {"body": {"type": "string"}}}
    # identical corpora → identical scores → pure tie-break territory
    docs = spark.createDataFrame(
        [("a", "zebra stripes"), ("b", "zebra crossing")],
        "k string, body string")
    for name in ("idx_b", "idx_a"):      # create out of lexical order
        c.create_index(name, mapping, key_col="k")
        c.bulk(name, docs, key_col="k", n_buckets=2, tbuckets=2,
               shuffle_partitions=2)
        c.put_alias("both", name)
    hits = c.search("both", {"term": {"body": "zebra"}}, size=10)
    assert len(hits) == 4
    # all four scores equal → order must be (index asc, doc_id asc)
    assert len({h["score"] for h in hits}) == 1
    assert [(h["_index"], h["doc_id"]) for h in hits] == sorted(
        (h["_index"], h["doc_id"]) for h in hits)
    # and a repeat run returns the identical permutation
    assert hits == c.search("both", {"term": {"body": "zebra"}}, size=10)

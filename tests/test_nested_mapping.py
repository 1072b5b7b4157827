"""Nested OBJECT mappings → dotted flattened fields.

Closes the reference's own TODO
(/root/reference/src/document.rs:87-89 "Nested objects" never
implemented): ES object mappings recurse into dotted field names,
struct columns flatten at prepare time, and every downstream
path — build, search, stored read, _all — treats ``author.name`` as
an ordinary field.  The ES `nested` TYPE (independent array-element
matching) is explicitly rejected, not silently mis-handled.
"""

from __future__ import annotations

import pytest

from rusticsearch_spark.mapping import (MappingParseError, parse_mapping,
                                        prepare_docs)

MAPPING = {"properties": {
    "text": {"type": "string"},
    "author": {"properties": {
        "name": {"type": "string", "index": "not_analyzed",
                 "store": True},
        "bio": {"type": "string"},
        "verified": {"type": "boolean"},
        "followers": {"type": "integer"},
    }},
}}


def test_parse_nested_object_mapping():
    fields = parse_mapping(MAPPING)
    names = {f.name for f in fields}
    assert names == {"text", "author.name", "author.bio",
                     "author.verified", "author.followers"}
    by = {f.name: f for f in fields}
    assert by["author.name"].analyzer is None          # not_analyzed
    assert by["author.bio"].is_analyzed
    assert by["author.verified"].type == "boolean"
    assert by["author.followers"].type == "integer"
    assert by["author.name"].store


def test_nested_type_rejected_and_bad_object_type():
    with pytest.raises(MappingParseError, match="nested"):
        parse_mapping({"properties": {
            "a": {"type": "nested", "properties": {"b": {}}}}})
    with pytest.raises(MappingParseError, match="object type"):
        parse_mapping({"properties": {
            "a": {"type": "string", "properties": {"b": {}}}}})


@pytest.fixture(scope="module")
def nested_cluster(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    from rusticsearch_spark.cluster import Cluster
    rows = [
        ("u1", "spark engine merge", ("alice", "loves fast queries",
                                      True, 120)),
        ("u2", "table scan merge", ("bob", "writes slow queries",
                                    False, 7)),
        ("u3", "hash join spark", ("alice", "ships spark jobs",
                                   True, 120)),
    ]
    df = spark.createDataFrame(
        rows, "url string, text string, author struct<"
              "name:string, bio:string, verified:boolean, "
              "followers:long>")
    c = Cluster(spark, str(tmp_path_factory.mktemp("nested") / "cl"))
    c.create_index("docs", MAPPING, key_col="url")
    c.bulk("docs", df, key_col="url", n_buckets=4, tbuckets=2,
           shuffle_partitions=4)
    return c


def test_search_on_nested_fields(nested_cluster):
    c = nested_cluster
    hits = c.search("docs", {"term": {"author.name": "alice"}}, size=10)
    assert {h["key"] for h in hits} == {"u1", "u3"}
    assert c.count("docs", {"term": {"author.verified": True}}) == 2
    assert c.count("docs", {"term": {"author.followers": 120}}) == 2
    # analyzed nested string field
    hits = c.search("docs", {"match": {"author.bio": "queries"}}, size=10)
    assert {h["key"] for h in hits} == {"u1", "u2"}
    # boolean combinators across nested and top-level fields
    got = c.search("docs", {"filtered": {
        "query": {"match": {"text": "merge"}},
        "filter": {"term": {"author.name": "alice"}}}}, size=10)
    assert [h["key"] for h in got] == ["u1"]


def test_nested_all_field_and_stored_read(nested_cluster):
    c = nested_cluster
    # _all includes nested string subfields (name + bio)
    assert c.count("docs", {"match": {"_all": "alice"}}) == 2
    doc = c.get_document("docs", "u2")
    assert doc["author.name"] == "bob"
    # stored-field retrieval through the `fields` hits parameter
    hits = c.search("docs", {"term": {"author.name": "bob"}},
                    size=5, fields=["author.name"])
    assert hits[0]["fields"]["author.name"] == ["bob"]


def test_prepare_docs_drops_root_struct(spark):
    df = spark.createDataFrame(
        [("u", "t", ("n", "b", True, 1))],
        "url string, text string, author struct<name:string,bio:string,"
        "verified:boolean, followers:long>")
    out = prepare_docs(df, parse_mapping(MAPPING))
    assert "author" not in out.columns
    assert "author.name" in out.columns and "author.bio" in out.columns
    row = out.collect()[0]
    assert row["author.verified"] == "true"
    assert row["author.followers"] == "1"


def test_illegal_field_names_rejected():
    with pytest.raises(MappingParseError, match="'[.]'"):
        parse_mapping({"properties": {"a.b": {"type": "string"}}})
    with pytest.raises(MappingParseError, match="illegal"):
        parse_mapping({"properties": {"a`b": {"type": "string"}}})

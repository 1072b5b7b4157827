"""Typed term encodings wired into the query path.

The reference encodes typed terms as bytes (src/search/term.rs:27-48:
boolean t/f, integer LE-i64, datetime LE-i64 UTC micros); this engine
stores one canonical string per value such that string equality ⇔
reference byte equality.  These tests pin:

1. the bijection: canonical strings collide exactly when
   ``terms.term_from_*`` bytes collide (tz goldens from
   term.rs:94-137);
2. the parser normalizes term/terms values on typed fields
   (json_value_to_term, src/api/utils.rs:63-77);
3. end-to-end through the Cluster mapping layer: a date-mapped field
   indexed from timestamps answers a term query written with a
   non-UTC offset.
"""

from __future__ import annotations

from datetime import datetime, timezone, timedelta

import pytest

from rusticsearch_spark import terms
from rusticsearch_spark.query import dsl


# --- 1. canonical string ⇔ reference bytes bijection -----------------

_TZ3 = timezone(timedelta(hours=3))
_TZM530 = timezone(timedelta(hours=-5, minutes=-30))

_DT_GOLDENS = [
    # same instant, three spellings (term.rs:94-137 tz semantics)
    ("2024-01-15T00:00:00.500000Z",
     "2024-01-15T03:00:00.500000+03:00",
     True),
    ("2024-01-15T00:00:00.500000Z",
     "2024-01-14T18:30:00.500000-05:30",
     True),
    # different instants
    ("2024-01-15T00:00:00.500000Z",
     "2024-01-15T00:00:00.500001Z",
     False),
    ("1970-01-01T00:00:00.000000Z",
     "1970-01-01T00:00:00.000000+00:00",
     True),
]


@pytest.mark.parametrize("a,b,equal", _DT_GOLDENS)
def test_date_canonical_matches_reference_bytes(a, b, equal):
    ca = terms.canonical_term_string("date", a)
    cb = terms.canonical_term_string("date", b)
    ba = terms.term_from_datetime(terms.parse_datetime_utc(a))
    bb = terms.term_from_datetime(terms.parse_datetime_utc(b))
    assert (ca == cb) == equal
    assert (ba == bb) == equal           # reference byte encoding agrees


def test_boolean_integer_canonical():
    assert terms.canonical_term_string("boolean", True) == "true"
    assert terms.canonical_term_string("boolean", "false") == "false"
    assert terms.canonical_term_string("integer", 42) == "42"
    assert terms.canonical_term_string("integer", -7) == "-7"
    with pytest.raises(ValueError):
        terms.canonical_term_string("boolean", "yes")
    with pytest.raises(ValueError):
        terms.canonical_term_string("integer", "x")
    # byte-level goldens (term.rs:27-39)
    assert terms.term_from_boolean(True) == b"t"
    assert terms.term_from_integer(42) == (42).to_bytes(8, "little")


# --- 2. parser normalization ------------------------------------------

def _ctx():
    return dsl.ParseContext(
        fields={"text": "standard", "flag": None, "n": None, "at": None},
        field_types={"flag": "boolean", "n": "integer", "at": "date"})


def test_parse_term_normalizes_typed_values():
    q = dsl.parse({"term": {"at": "2024-01-15T03:00:00+03:00"}}, _ctx())
    assert q.term == "2024-01-15T00:00:00.000000Z"
    q = dsl.parse({"term": {"flag": True}}, _ctx())
    assert q.term == "true"
    q = dsl.parse({"terms": {"n": [1, 2]}}, _ctx())
    assert sorted(t.term for t in q.queries) == ["1", "2"]


def test_parse_term_rejects_bad_typed_values():
    with pytest.raises(dsl.QueryParseError):
        dsl.parse({"term": {"n": "not-a-number"}}, _ctx())


# --- 3. end-to-end through the mapping/cluster layer ------------------

def test_date_field_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F
    from rusticsearch_spark.cluster import Cluster

    rows = [(f"d{i}", f"doc number {i}",
             datetime(2024, 1, 1 + i % 5, 12, 0, 0, 250000,
                      tzinfo=timezone.utc)) for i in range(20)]
    docs = spark.createDataFrame(rows, "k string, body string, at timestamp")
    c = Cluster(spark, str(tmp_path / "cluster"))
    c.create_index("pages", {"properties": {
        "body": {"type": "string"},
        "at": {"type": "date"},
    }}, key_col="k")
    c.bulk("pages", docs, key_col="k", n_buckets=2, tbuckets=2,
           shuffle_partitions=2)
    # query the 2024-01-03 12:00:00.250 UTC instant spelled at +03:00
    hits = c.search("pages", {"term": {
        "at": "2024-01-03T15:00:00.250000+03:00"}}, size=20)
    want = {f"d{i}" for i in range(20) if i % 5 == 2}
    assert {h["key"] for h in hits} == want
    # boolean/int handling goes through the same path: count via terms
    assert c.count("pages", {"term": {
        "at": "2024-01-03T12:00:00.250000Z"}}) == len(want)

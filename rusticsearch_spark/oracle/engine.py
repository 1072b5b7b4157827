"""Single-node pure-Python oracle with the reference's exact semantics.

Reimplements, doc-at-a-time and entirely in numpy float32, the scoring
pipeline of the reference:

* index-time quantization (tf elision, 1-byte length) —
  /root/reference/src/search/backends/rocksdb/segment_builder.rs:79-103
* f32 similarity math — src/search/similarity.rs:8-34
* per-doc score VM semantics (Avg over child count with 0.0 for
  non-matching children, Max) —
  src/search/backends/rocksdb/search/mod.rs:79-155 +
  score_function.rs:21-38,74-88
* boolean match semantics — src/search/query/mod.rs:78-110

Used to generate golden top-k lists the Spark engine must reproduce
rank-identically (doc_id tie-break; see the precision policy note in
``query/engine.py``).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..analysis.analyzers import AnalyzerRegistry
from ..query import dsl
from ..similarity import bm25_f32, length_byte, length_from_byte, tfidf_f32


class OracleIndex:
    def __init__(self, fields: Dict[str, Optional[str]],
                 registry: Optional[AnalyzerRegistry] = None):
        self.fields = fields
        self.registry = registry or AnalyzerRegistry()
        # field -> term -> {doc_id: tf}
        self.postings: Dict[str, Dict[str, Dict[int, int]]] = {
            f: {} for f in fields}
        self.len_bytes: Dict[Tuple[str, int], int] = {}
        self.field_docs: Counter = Counter()
        self.field_tokens: Counter = Counter()
        self.doc_ids: List[int] = []
        # logical deletes: excluded from matching, but statistics stay
        # un-decremented until merge (statistics.rs deleted_docs)
        self.deleted: set = set()

    def delete(self, doc_id: int) -> None:
        self.deleted.add(doc_id)

    # -- indexing (segment_builder.rs:53-132 semantics) ---------------
    def add(self, doc_id: int, values: Dict[str, Optional[str]]) -> None:
        self.doc_ids.append(doc_id)
        for field, analyzer_name in self.fields.items():
            value = values.get(field)
            if value is None:
                continue
            if analyzer_name is None:
                terms = [str(value)]
            else:
                terms = self.registry.get(analyzer_name).terms(value)
            self.field_docs[field] += 1
            self.field_tokens[field] += len(terms)
            self.len_bytes[(field, doc_id)] = length_byte(len(terms))
            post = self.postings[field]
            for term, tf in Counter(terms).items():
                post.setdefault(term, {})[doc_id] = tf

    # -- scoring ------------------------------------------------------
    def _term_score(self, field: str, term: str, doc_id: int,
                    scorer: dsl.TermScorer) -> np.float32:
        tfs = self.postings.get(field, {}).get(term)
        if not tfs or doc_id not in tfs:
            return np.float32(0.0)
        tf = tfs[doc_id]
        if scorer.similarity == dsl.TFIDF:
            s = tfidf_f32(tf, self.field_docs[field], len(tfs))
        else:
            s = bm25_f32(
                tf, length_from_byte(self.len_bytes.get((field, doc_id), 0)),
                self.field_tokens[field], self.field_docs[field], len(tfs))
        return np.float32(s) * np.float32(scorer.boost)

    def matches(self, q: dsl.Query, doc_id: int) -> bool:
        if isinstance(q, dsl.All):
            return True
        if isinstance(q, dsl.NoneQuery):
            return False
        if isinstance(q, dsl.Term):
            tfs = self.postings.get(q.field, {}).get(q.term)
            return bool(tfs) and doc_id in tfs
        if isinstance(q, dsl.Prefix):
            return any(doc_id in tfs for term, tfs in
                       self.postings.get(q.field, {}).items()
                       if term.startswith(q.prefix))
        if isinstance(q, dsl.Conjunction):
            return all(self.matches(c, doc_id) for c in q.queries)
        if isinstance(q, (dsl.Disjunction, dsl.DisjunctionMax)):
            return any(self.matches(c, doc_id) for c in q.queries)
        if isinstance(q, dsl.Filter):
            return (self.matches(q.query, doc_id)
                    and self.matches(q.filter, doc_id))
        if isinstance(q, dsl.Exclude):
            return (self.matches(q.query, doc_id)
                    and not self.matches(q.exclude, doc_id))
        raise TypeError(type(q))

    def score(self, q: dsl.Query, doc_id: int) -> np.float32:
        """score_doc over a matching doc (0.0 pushed for non-matching
        sub-queries, rocksdb/search/mod.rs:112-116); f32 accumulation."""
        if isinstance(q, dsl.All):
            return np.float32(q.score)
        if isinstance(q, dsl.NoneQuery):
            return np.float32(0.0)
        if isinstance(q, dsl.Term):
            return self._term_score(q.field, q.term, doc_id, q.scorer)
        if isinstance(q, dsl.Prefix):
            matched = [t for t in self.postings.get(q.field, {})
                       if t.startswith(q.prefix)]
            if not matched:
                return np.float32(0.0)
            # Avg over GLOBAL dictionary matches (all fields),
            # term_dictionary.rs:78-85: out-of-field matches score 0
            n_dict = len({t for f in self.postings
                          for t in self.postings[f]
                          if t.startswith(q.prefix)})
            acc = np.float32(0.0)
            for term in matched:
                acc = acc + self._term_score(q.field, term, doc_id, q.scorer)
            return acc / np.float32(n_dict)
        if isinstance(q, (dsl.Conjunction, dsl.Disjunction)):
            acc = np.float32(0.0)
            for c in q.queries:
                if self.matches(c, doc_id):
                    acc = acc + self.score(c, doc_id)
            return acc / np.float32(len(q.queries))
        if isinstance(q, dsl.DisjunctionMax):
            best = np.float32(0.0)
            for c in q.queries:
                if self.matches(c, doc_id):
                    best = max(best, self.score(c, doc_id))
            return best
        if isinstance(q, dsl.Filter):
            return self.score(q.query, doc_id)
        if isinstance(q, dsl.Exclude):
            return self.score(q.query, doc_id)
        raise TypeError(type(q))

    # -- collectors -----------------------------------------------------
    def search(self, q: dsl.Query, k: int = 10,
               from_: int = 0) -> List[Tuple[int, float]]:
        hits = [(doc_id, float(self.score(q, doc_id)))
                for doc_id in self.doc_ids
                if doc_id not in self.deleted and self.matches(q, doc_id)]
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits[from_:from_ + k]

    def count(self, q: dsl.Query) -> int:
        return sum(1 for d in self.doc_ids
                   if d not in self.deleted and self.matches(q, d))

"""Docset join strategy is picked on dictionary cardinality, not
Spark's blind estimate (guide §3.1): a mapInArrow docset has no size
statistics, so the planner would broadcast ANY excluded/filtered
docset — at web scale a head term's docset is a multi-GB broadcast.
The engine annotates term docsets with their exact df (a free
driver-side dictionary lookup) and pins the semi/anti join to
shuffled-hash above DOCSET_BROADCAST_MAX."""

from __future__ import annotations


def _plan(frame) -> str:
    return frame._jdf.queryExecution().executedPlan().toString()


def test_small_docset_still_broadcasts(engine):
    q = {"not": {"term": {"lang": "en"}}}
    assert "BroadcastHashJoin" in _plan(engine.search(q, size=10))


def test_large_docset_pins_shuffled_hash(engine):
    q = {"not": {"term": {"lang": "en"}}}
    base = sorted((r.doc_id, round(r.score, 6))
                  for r in engine.search(q, size=500).collect())
    bak = engine.DOCSET_BROADCAST_MAX
    engine.DOCSET_BROADCAST_MAX = 1       # every docset counts as huge
    try:
        hinted_plan = _plan(engine.search(q, size=500))
        hinted = sorted((r.doc_id, round(r.score, 6))
                        for r in engine.search(q, size=500).collect())
    finally:
        engine.DOCSET_BROADCAST_MAX = bak
    assert "ShuffledHashJoin" in hinted_plan
    assert hinted == base and len(base) > 0

"""Driver-side serving-tier bench over an existing index artifact —
NO Spark session.  Produced the BENCH/APPENDIX_serving.md round-5b
numbers (3.2M-doc artifact = /tmp/rusticsearch_bench_idx_32 from a
bench.py run).

    python scripts/serving_bench.py <index_dir> [--lazy] [--runs N]

Prints one JSON line: shard count, cold-load seconds, per-query warm
medians (ms), first-query cost in lazy mode (the decode-on-demand
price), p50/p95.  Pair eager vs lazy runs in the SAME session — this
host's fresh-allocation capacity swings ~200-700x between windows
(BENCH/APPENDIX_host.md) and the eager load is allocation-bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

QUERIES = [
    ("term", {"term": {"text": "merge"}}),
    ("match_or", {"match": {"text": "spark query data"}}),
    ("match_and", {"match": {"text": {"query": "table scan",
                                      "operator": "and"}}}),
    ("prefix", {"prefix": {"text": "sc"}}),
    ("filtered", {"filtered": {"query": {"match": {"text": "hash join"}},
                               "filter": {"term": {"lang": "en"}}}}),
    ("dis_max", {"multi_match": {"query": "window merge",
                                 "fields": ["text^2", "lang"]}}),
    ("not", {"not": {"term": {"lang": "en"}}}),
    ("count_all", None),
]


def main() -> None:
    from rusticsearch_spark.query.local import ShardedSearcher

    args = sys.argv[1:]
    lazy = "--lazy" in args
    runs, pos, skip = 5, [], False
    for i, a in enumerate(args):
        if skip:
            skip = False
        elif a == "--lazy":
            pass
        elif a == "--runs":
            runs, skip = int(args[i + 1]), True
        else:
            pos.append(a)
    idx = pos[0] if pos else "/tmp/rusticsearch_bench_idx_32"

    t0 = time.monotonic()
    ss = ShardedSearcher(idx, lazy=lazy)
    load_sec = time.monotonic() - t0

    lat, first, all_runs = {}, {}, []
    for name, q in QUERIES:
        t0 = time.monotonic()
        ss.count() if q is None else ss.search(q, size=10)   # warm/decode
        first[name] = round((time.monotonic() - t0) * 1000, 3)
        rs = []
        for _ in range(runs):
            t0 = time.monotonic()
            ss.count() if q is None else ss.search(q, size=10)
            rs.append(time.monotonic() - t0)
        rs.sort()
        lat[name] = round(rs[len(rs) // 2] * 1000, 3)
        all_runs.extend(rs)
    all_runs.sort()
    print(json.dumps({
        "artifact": idx, "mode": "lazy" if lazy else "eager",
        "n_shards": len(ss.shards), "load_sec": round(load_sec, 2),
        "first_query_ms": first, "query_ms_median": lat,
        "p50_ms": round(all_runs[len(all_runs) // 2] * 1000, 3),
        "p95_ms": round(all_runs[min(len(all_runs) - 1,
                                     int(len(all_runs) * 0.95))]
                        * 1000, 3),
    }))


if __name__ == "__main__":
    main()

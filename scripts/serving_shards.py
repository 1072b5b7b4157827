"""Serving-tier shard-count ladder (VERDICT r6 #7): one 16-job
artifact, served as 1/2/4/8/16 shards by grouping jobs, measuring
the k-way merge overhead and pinning result identity across shard
counts.

    python scripts/serving_shards.py [replicate]

Prints one JSON line per shard count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
RUNS = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "9"))

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
]


def main() -> None:
    from pyspark.sql import SparkSession

    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig, IndexLayout
    from rusticsearch_spark.query.local import ShardedSearcher

    idx = f"/tmp/serving_shards_idx_{REP}"
    if not os.path.isdir(os.path.join(idx, "lineage")):
        spark = (SparkSession.builder.master("local[16]")
                 .config("spark.sql.shuffle.partitions", "32")
                 .config("spark.ui.enabled", "false")
                 .config("spark.driver.memory", "16g")
                 .config("spark.scheduler.mode", "FAIR")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        from rusticsearch_spark.synth.webtext import webtext_table
        src = f"/tmp/rusticsearch_bench_src_{os.path.basename(SF)}_{REP}"
        if not os.path.exists(src + "/_SUCCESS"):
            shutil.rmtree(src, ignore_errors=True)
            webtext_table(spark, SF, replicate=REP).repartition(64) \
                .write.mode("overwrite").parquet(src)
        docs = spark.read.parquet(src)
        shutil.rmtree(idx, ignore_errors=True)
        build_index(spark, docs, idx,
                    IndexConfig(key_col="url",
                                fields={"text": "standard", "lang": None},
                                n_buckets=64, tbuckets=4,
                                shuffle_partitions=32),
                    jobs=16, parallel=2)
        spark.stop()

    jobs = IndexLayout(idx).completed_jobs_local()
    assert len(jobs) == 16, jobs
    baseline = None
    for n_shards in (1, 2, 4, 8, 16):
        per = len(jobs) // n_shards
        groups = [jobs[i * per:(i + 1) * per] for i in range(n_shards)]
        t0 = time.monotonic()
        ss = ShardedSearcher(idx, shards=groups, lazy=True)
        load_s = time.monotonic() - t0
        lat = {}
        results = {}
        for name, q in QUERIES:
            ss.search(q, size=10)            # warm (lazy decode)
            runs = []
            for _ in range(RUNS):
                t0 = time.monotonic()
                r = ss.search(q, size=10)
                runs.append(time.monotonic() - t0)
            runs.sort()
            lat[name] = round(runs[len(runs) // 2] * 1000, 3)
            results[name] = [(int(d), float(s)) for d, s in r]
        if baseline is None:
            baseline = results
        identical = all(results[n] == baseline[n] for n, _ in QUERIES)
        alls = sorted(v for v in lat.values())
        print(json.dumps({
            "n_shards": n_shards, "load_s": round(load_s, 2),
            "latency_ms": lat,
            "p50_ms": alls[len(alls) // 2],
            "max_ms": alls[-1],
            "identical_to_1_shard": identical,
        }), flush=True)
        assert identical, f"shard count {n_shards} changed results"


if __name__ == "__main__":
    main()

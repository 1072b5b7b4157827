"""Benchmark harness: index-build throughput + BM25 query latency.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "build_sec": ..., "build_docs_per_sec": ..., "n_docs": ...,
     "query_p50_sec": ..., "query_p95_sec": ...}

The scaling-efficiency evidence (same job at local[8] vs local[32])
is produced by ``scripts/scaling.py``, which shells out to this file
with different ``SPARK_GRAFT_CPUS`` and writes ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "1"))
RUNS_PER_QUERY = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "3"))

# the reference query set (SURVEY.md §2.3/§2.4 operators)
BENCH_QUERIES = [
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
    ("count_all", None),  # _count of match_all
]


def main() -> None:
    # Stamp the recording window (VERDICT r5 #5): this host's capacity
    # swings ±2× across sessions, so every snapshot carries pre/post
    # host-probe readings — a degraded stamp tells the reader which
    # lanes to distrust (numpy fresh-alloc paths; the JVM build is
    # measured insensitive to the memory-collapse mode,
    # BENCH/APPENDIX_r6_buildwall.md).  SPARK_GRAFT_WAIT_QUIET=<sec>
    # optionally polls up to that budget for a quiet window first.
    from host_probe import probe
    probe_pre = probe()
    wait_budget = float(os.environ.get("SPARK_GRAFT_WAIT_QUIET", "0"))
    waited = 0.0
    while probe_pre["health"] != "quiet" and waited < wait_budget:
        time.sleep(min(30.0, wait_budget - waited))
        waited += 30.0
        probe_pre = probe()

    from pyspark.sql import SparkSession

    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    from rusticsearch_spark.query.engine import SearchEngine
    from rusticsearch_spark.synth.webtext import webtext_table

    # Defaults = the round-5 same-session experiment winner
    # (scripts/r5_matrix.py, BENCH/APPENDIX_r5_experiments.md):
    # AQE OFF (its stage-by-stage driver re-planning is serialized
    # per-stage cost — the measured Amdahl share), 32m read splits
    # (fewer, larger scan tasks), coarse shuffle partitions
    # (max(16, 2×cores): 16 was measured best at 2/8 cores; the
    # floor keeps ≥2 waves per core at higher counts).  Every knob
    # remains env-overridable.
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName(f"rusticsearch-bench-{CPUS}")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARK_GRAFT_SHUFFLE",
                                    str(max(16, 2 * CPUS))))
             .config("spark.sql.files.maxPartitionBytes",
                     os.environ.get("SPARK_GRAFT_MAX_PART", "32m"))
             .config("spark.sql.files.openCostInBytes", "1m")
             # Fat Arrow batches for the mapInArrow encoder / decode
             # stages (the tokenizer pandas UDF that needed tiny
             # batches no longer runs on ASCII-safe web text)
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     os.environ.get("SPARK_GRAFT_ARROW_BATCH", "32768"))
             .config("spark.sql.adaptive.enabled",
                     "true" if os.environ.get("SPARK_GRAFT_AQE",
                                              "0") == "1" else "false")
             # small sort pages: Tungsten in-memory sort runs stay
             # cache-resident (a 24MB random-access sort scales at
             # 0.45x/core on shared-LLC hosts, a 2MB one at 0.93x —
             # measured), with a streaming merge on top
             .config("spark.buffer.pageSize",
                     os.environ.get("SPARK_GRAFT_PAGE", "1m"))
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             # FAIR + per-job pools: concurrent build write_jobs share
             # task slots instead of queueing behind each other
             .config("spark.scheduler.mode", "FAIR")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    wt = webtext_table(spark, SF_DIR, replicate=REPLICATE)
    # materialize the synthetic input once so build timing measures the
    # build, not the synthetic html rendering
    src_path = f"/tmp/rusticsearch_bench_src_{os.path.basename(SF_DIR)}_{REPLICATE}"
    if not os.path.exists(src_path + "/_SUCCESS"):
        shutil.rmtree(src_path, ignore_errors=True)
        # repartition before writing: the replicate crossJoin otherwise
        # yields ONE output file / one giant row group, which collapses
        # every downstream scan (and its Python workers) to 1 task
        wt.repartition(64).write.mode("overwrite").parquet(src_path)
    docs = spark.read.parquet(src_path)
    n_docs = docs.count()

    idx_dir = f"/tmp/rusticsearch_bench_idx_{CPUS}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    # logical plan held CONSTANT across parallelism levels (same bucket
    # count, same shuffle partitioning) so the scaling comparison
    # isolates executor parallelism, not plan shape
    cfg = IndexConfig(key_col="url", fields={"text": "standard",
                                             "lang": None},
                      n_buckets=int(os.environ.get(
                          "SPARK_GRAFT_BUCKETS", "64")),
                      tbuckets=int(os.environ.get(
                          "SPARK_GRAFT_TBUCKETS", "4")),
                      shuffle_partitions=int(os.environ.get(
                          "SPARK_GRAFT_SHUFFLE", str(max(16, 2 * CPUS)))))
    # Pipeline parallelism across index jobs: each job's driver-serial
    # stage transitions (plan, task launch, observe-collect, commit)
    # overlap the other job's executor work — the measured Amdahl
    # share of the 2->8 scaling gap (BENCH/APPENDIX_r5_experiments.md).
    # Jobs are the document-sharding unit, so the artifact is
    # query-identical (test_parallel_build_equals_serial); identical
    # jobs/parallel at every CPU level keeps the scaling comparison
    # honest.
    # Defaults = the round-5 parallel-build experiment winner
    # (jobs=2 concurrent write_jobs: best 8-core absolute throughput
    # at both matrix rounds' best-of-2, ~-7% at 2 cores — adopted
    # because the criterion rewards throughput at BOTH levels, and
    # the 8c gain is ~4x the 2c cost)
    build_jobs = int(os.environ.get("SPARK_GRAFT_BUILD_JOBS", "2"))
    build_par = int(os.environ.get("SPARK_GRAFT_BUILD_PAR", "2"))
    t0 = time.monotonic()
    build_index(spark, docs, idx_dir, cfg, jobs=build_jobs,
                parallel=build_par)
    build_sec = time.monotonic() - t0

    engine = SearchEngine(spark, idx_dir, cache_postings=True)
    engine.postings.count()          # populate the serving cache
    latencies: dict = {}
    all_lat = []
    for name, q in BENCH_QUERIES:
        # one untimed warmup (plan compilation, cache) then timed runs
        if q is None:
            engine.count()
        else:
            engine.search(q, size=10).collect()
        runs = []
        for _ in range(RUNS_PER_QUERY):
            t0 = time.monotonic()
            if q is None:
                engine.count()
            else:
                engine.search(q, size=10).collect()
            runs.append(time.monotonic() - t0)
        runs.sort()
        latencies[name] = round(runs[len(runs) // 2], 4)  # median
        all_lat.extend(runs)
    all_lat.sort()
    p95 = all_lat[min(len(all_lat) - 1, int(len(all_lat) * 0.95))]
    p50 = all_lat[len(all_lat) // 2]

    # local-serving lane: the reference is a SINGLE-NODE server, so
    # the apples-to-apples BM25 top-10 latency is the driver-side
    # LocalSearcher over the same artifact (query/local.py — exact
    # f32 rank identity), not a Spark job per query.  Additive keys;
    # the Spark-lane numbers above are unchanged.
    # SPARK_GRAFT_SERVING=0 skips this lane: the eager shard load is
    # the one bench phase dominated by fresh-page allocation, which
    # this host's degraded windows slow ~100x — a multi-run scaling
    # session must not serialize behind it (serving evidence lives in
    # BENCH/APPENDIX_serving.md and the default single-run lane)
    local_lat: dict = {}
    local_p50 = local_p95 = None
    try:
        if os.environ.get("SPARK_GRAFT_SERVING", "1") == "0":
            raise RuntimeError("serving lane disabled")
        from rusticsearch_spark.query.local import LocalSearcher
        ls = LocalSearcher(idx_dir)
        lruns_all = []
        for name, q in BENCH_QUERIES:
            ls.count() if q is None else ls.search(q, size=10)  # warm
            runs = []
            for _ in range(max(RUNS_PER_QUERY, 3)):
                t0 = time.monotonic()
                ls.count() if q is None else ls.search(q, size=10)
                runs.append(time.monotonic() - t0)
            runs.sort()
            local_lat[name] = round(runs[len(runs) // 2], 5)
            lruns_all.extend(runs)
        lruns_all.sort()
        local_p50 = round(lruns_all[len(lruns_all) // 2], 5)
        local_p95 = round(lruns_all[min(len(lruns_all) - 1,
                                        int(len(lruns_all) * 0.95))], 5)
    except Exception:
        local_p50 = local_p95 = None

    total = build_sec + sum(latencies.values())
    print(json.dumps({
        "metric": "index_build_plus_bm25_query_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": latencies,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_p50_sec": round(p50, 4),
        "query_p95_sec": round(p95, 4),
        "serving_local_queries": local_lat,
        "serving_local_p50_sec": local_p50,
        "serving_local_p95_sec": local_p95,
        "host_probe_pre": probe_pre,
        "host_probe_post": probe(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

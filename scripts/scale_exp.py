"""Quick build-only scaling experiments: variants × core counts.

    python scripts/scale_exp.py <cpus> <variant> [replicate]

Variants: base | precount0 | zstd | a free-form conf spec
``k=v;k=v`` with keys
    sh=<int>      spark.sql.shuffle.partitions + IndexConfig
    aqe=<0|1>     spark.sql.adaptive.enabled
    mpb=<str>     spark.sql.files.maxPartitionBytes (e.g. 32m)
    arrow=<int>   spark.sql.execution.arrow.maxRecordsPerBatch
    page=<str>    spark.buffer.pageSize
    loc=<str>     spark.locality.wait (e.g. 0s)
    precount=<0|1>
    jobs=<int>    build_index jobs (document shards)
    par=<int>     concurrent write_jobs (driver threads, FAIR pools)
    lc=<w>:<c>:<memMB>  master local-cluster[w,c,mem] instead of
                  local[cpus] — N executor JVMs with their own
                  task-launch/result/Python-worker paths (the
                  VERDICT r6 #3 attribution experiment; <cpus> arg
                  is ignored for the master but kept for labeling)
Prints one JSON line with build seconds + docs/sec.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1])
VARIANT = sys.argv[2]
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 128
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def parse_spec(v: str) -> dict:
    if "=" not in v:
        return {}
    return dict(kv.split("=", 1) for kv in v.split(";") if kv)


def main():
    from pyspark.sql import SparkSession
    spec = parse_spec(VARIANT)
    shuffle = int(spec.get("sh", os.environ.get("SPARK_GRAFT_SHUFFLE", "16")))
    master = f"local[{CPUS}]"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "lc" in spec:
        w, c, mem = spec["lc"].split(":")
        master = f"local-cluster[{w},{c},{mem}]"
        # executor JVMs spawn their own Python workers, which need
        # the repo on their path (local mode inherits the driver's)
        os.environ.setdefault("PYTHONPATH", repo)
    b = (SparkSession.builder.master(master)
         .config("spark.executorEnv.PYTHONPATH", repo)
         .appName(f"scale-exp-{CPUS}-{VARIANT}")
         .config("spark.sql.shuffle.partitions", str(shuffle))
         .config("spark.sql.files.maxPartitionBytes", spec.get("mpb", "32m"))
         .config("spark.sql.files.openCostInBytes", "1m")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 spec.get("arrow", "32768"))
         .config("spark.sql.adaptive.enabled",
                 "true" if spec.get("aqe", "0") == "1" else "false")
         .config("spark.buffer.pageSize", spec.get("page", "1m"))
         .config("spark.driver.memory", "24g")
         .config("spark.scheduler.mode", "FAIR")
         .config("spark.ui.enabled", "false"))
    if "loc" in spec:
        b = b.config("spark.locality.wait", spec["loc"])
    if VARIANT == "zstd":
        b = b.config("spark.io.compression.codec", "zstd")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig
    from rusticsearch_spark.synth.webtext import webtext_table

    src = f"/tmp/rusticsearch_bench_src_{os.path.basename(SF)}_{REP}"
    if not os.path.exists(src + "/_SUCCESS"):
        shutil.rmtree(src, ignore_errors=True)
        webtext_table(spark, SF, replicate=REP).repartition(64) \
            .write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    n = docs.count()
    idx = f"/tmp/scale_exp_idx_{CPUS}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(key_col="url",
                      fields={"text": "standard", "lang": None},
                      n_buckets=64, tbuckets=4,
                      shuffle_partitions=shuffle,
                      precount=(spec.get("precount", "1") != "0"
                                and VARIANT != "precount0"))
    t0 = time.monotonic()
    build_index(spark, docs, idx, cfg, jobs=int(spec.get("jobs", "1")),
                parallel=int(spec.get("par", "1")))
    sec = time.monotonic() - t0
    from host_probe import probe
    print(json.dumps({"cpus": CPUS, "variant": VARIANT, "n_docs": n,
                      "build_sec": round(sec, 2),
                      "docs_per_sec": round(n / sec, 1),
                      "host_probe_post": probe()}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Phase-level build profiling at a given parallelism — attribution
evidence for the scaling story: which build phase stops scaling when
cores share one memory subsystem.

    taskset -c 0-(N-1) python scripts/profile_build.py <cpus> [src_parquet]

Phases measured independently (each materializes to a throwaway
count/write so Spark executes exactly that slice of the build):
  read+count      — parquet scan of the source
  ids+docs_write  — doc-id window + docs table write
  tokenize        — _posting_rows up to a count (no shuffle write)
  full_encode     — the real postings pipeline (shuffle + sort +
                    Arrow encoder + partitioned write)
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(sys.argv[1])
SRC = sys.argv[2] if len(sys.argv) > 2 else \
    "/tmp/rusticsearch_bench_src_sf0.1_128"

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SHUFFLE = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))
_builder = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", str(SHUFFLE))
         .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PART", "32m"))
         .config("spark.sql.files.openCostInBytes", "1m")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
         .config("spark.sql.adaptive.enabled", "true" if os.environ.get("SPARK_GRAFT_AQE", "0") == "1" else "false")
         .config("spark.buffer.pageSize", "1m")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false"))
# optional: put shuffle/spill files on a different device (e.g. a
# tmpfs) to separate CPU/memory scaling from the sandbox's single
# shared virtio disk — on a real cluster every executor brings its
# own local disks, so disk bandwidth scales WITH executors there
if os.environ.get("SPARK_GRAFT_LOCAL_DIR"):
    _builder = _builder.config("spark.local.dir",
                               os.environ["SPARK_GRAFT_LOCAL_DIR"])
if os.environ.get("SPARK_GRAFT_JAVA_OPTS"):
    _builder = _builder.config("spark.driver.extraJavaOptions",
                               os.environ["SPARK_GRAFT_JAVA_OPTS"])
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from rusticsearch_spark.analysis.analyzers import AnalyzerRegistry
from rusticsearch_spark.index.build import (POSTINGS_SCHEMA,
                                            _encode_partitions_arrow,
                                            _posting_rows, assign_doc_ids)
from rusticsearch_spark.index.codec import SEGMENT_BITS
from rusticsearch_spark.index.layout import IndexConfig, term_bucket_col

cfg = IndexConfig(key_col="url", fields={"text": "standard", "lang": None},
                  n_buckets=64, tbuckets=4, shuffle_partitions=SHUFFLE)
reg = AnalyzerRegistry()
out = os.environ.get("SPARK_GRAFT_PROFILE_OUT",
                     "/tmp") + f"/profile_idx_{CPUS}"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)


def phase(name, fn):
    t0 = time.monotonic()
    fn()
    print(f"[profile cpus={CPUS}] {name}: {time.monotonic() - t0:.1f}s",
          flush=True)


docs = spark.read.parquet(SRC)
phase("read+count", lambda: docs.count())

ids = assign_doc_ids(docs, "url", cfg.n_buckets).drop("_bucket")
phase("ids+docs_write", lambda: ids.select("doc_id", "url", "text", "lang")
      .write.mode("overwrite").parquet(out + "/docs"))

ids2 = spark.read.parquet(out + "/docs")
flat = _posting_rows(ids2, cfg, reg, precount=cfg.precount)
phase("tokenize", lambda: flat.count())

phase("full_encode", lambda: (
    flat.repartition(SHUFFLE, "field_ord", "term",
                     F.shiftrightunsigned("doc_id", SEGMENT_BITS))
    .withColumn("segment", F.shiftrightunsigned("doc_id", SEGMENT_BITS))
    .withColumn("tbucket", term_bucket_col(F.col("term"), cfg.tbuckets))
    .withColumn("gkey", F.xxhash64("field_ord", "term", "segment"))
    .sortWithinPartitions("tbucket", "field_ord", "term", "segment",
                          "doc_id")
    .mapInArrow(_encode_partitions_arrow(list(cfg.fields)),
                schema=POSTINGS_SCHEMA)
    .write.mode("overwrite").partitionBy("tbucket")
    .parquet(out + "/postings")))
spark.stop()

"""Phase-level build profiling at a given parallelism.

    python scripts/profile_build.py <cpus>
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(sys.argv[1])

from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.sql.files.maxPartitionBytes", "8m")
         .config("spark.sql.files.openCostInBytes", "1m")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from rusticsearch_spark.index.build import (assign_doc_ids, tokenize_udf,
                                            _posting_rows, _encode_partitions,
                                            POSTINGS_SCHEMA)
from rusticsearch_spark.index.layout import IndexConfig
from rusticsearch_spark.analysis.analyzers import AnalyzerRegistry
from rusticsearch_spark.index.codec import SEGMENT_BITS

SRC = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rusticsearch_bench_src_sf0.1_16"
docs = spark.read.parquet(SRC)
cfg = IndexConfig(key_col="url", fields={"text": "standard", "lang": None},
                  n_buckets=64, tbuckets=8, shuffle_partitions=64)
reg = AnalyzerRegistry()

def phase(name, fn):
    t0 = time.monotonic()
    r = fn()
    print(f"{name}: {time.monotonic()-t0:.1f}s", flush=True)
    return r

out = f"/tmp/profile_idx_{CPUS}"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)

phase("read+count", lambda: docs.count())
ids = assign_doc_ids(docs, "url", 64).drop("_bucket")
phase("docs_write(window+ids)", lambda: ids.select("doc_id", "url", "text", "lang")
      .write.mode("overwrite").parquet(out + "/docs"))
ids2 = spark.read.parquet(out + "/docs")
flat = _posting_rows(ids2, cfg, reg).withColumn(
    "segment", F.shiftrightunsigned("doc_id", SEGMENT_BITS))
phase("tokenize_only(count)", lambda: flat.count())
encoded = (flat.repartition(64, "field", "term", "segment")
           .sortWithinPartitions("field", "term", "segment", "doc_id")
           .mapInPandas(_encode_partitions(8), schema=POSTINGS_SCHEMA))
phase("encode_write", lambda: (encoded
    .repartitionByRange(64, "field", "term", "segment")
    .sortWithinPartitions("tbucket", "field", "term", "segment")
    .write.mode("overwrite").partitionBy("tbucket").parquet(out + "/postings")))
spark.stop()

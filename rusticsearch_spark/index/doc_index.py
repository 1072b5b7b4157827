"""Primary-key → doc_id sidecar (the reference's document index).

The reference mirrors an in-memory key→DocId map to ``k<doc_key>``
RocksDB keys so upserts and deletes are point lookups
(/root/reference/src/search/backends/rocksdb/document_index.rs:16-91,
key_builder.rs:118-134).  The Spark analogue is a narrow per-job
``doc_index`` table ``(key, doc_id)`` partitioned by a GLOBAL
key-hash bucket: resolving a batch of keys reads only the matching
``kbucket=`` partition dirs — O(corpus / kbuckets · touched buckets)
instead of the full docs scan, which was the one remaining
O(corpus)-per-micro-batch cliff in the streaming upsert/delete path.

The bucket hash is xxhash64(key) mod kbuckets — stable across batch
and streaming jobs (unlike the doc-id bucket, whose namespace shifts
per streaming batch), so one key always lands in the same partition
dir of every job.  Readers fall back to the docs scan when any
committed docs job lacks its sidecar (an index built before this
table existed): correctness never depends on the sidecar.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import IndexConfig, IndexLayout


def key_bucket_col(key_col, kbuckets: int):
    """key → doc_index partition bucket, as a native SQL column."""
    return F.pmod(F.xxhash64(key_col), F.lit(kbuckets)).cast("int")


def write_doc_index(ids: DataFrame, layout: IndexLayout,
                    config: IndexConfig, job: int,
                    shuffle_partitions: int) -> None:
    """Write one job's (key, doc_id) sidecar, partitioned by the
    global key bucket.  Narrow columns only — at 10⁹ docs this is
    ~tens of GB against a multi-TB corpus."""
    (ids.select(F.col(config.key_col), F.col("doc_id"))
     .withColumn("kbucket", key_bucket_col(F.col(config.key_col),
                                           config.kbuckets))
     .repartition(min(config.kbuckets, shuffle_partitions), "kbucket")
     .write.mode("overwrite").partitionBy("kbucket")
     .parquet(layout.job_dir("doc_index", job)))


def _sidecar_complete(layout: IndexLayout, jobs: List[int]) -> bool:
    """True iff every committed job that has docs also has its
    doc_index sidecar (mixed old/new indexes must not miss docs)."""
    for j in jobs:
        if (os.path.isdir(layout.job_dir("docs", j))
                and not os.path.isdir(layout.job_dir("doc_index", j))):
            return False
    return True


def resolve_keys(spark: SparkSession, layout: IndexLayout,
                 config: IndexConfig,
                 keys: DataFrame) -> Optional[DataFrame]:
    """(key, doc_id) rows for every indexed document whose key appears
    in ``keys`` (a one-column DataFrame named ``config.key_col``).

    Reads only the kbucket partitions the wanted keys hash into: the
    distinct-buckets aggregate collects ≤ kbuckets rows however large
    the key batch, then partition pruning limits the scan.  Returns
    None when the index has no committed docs at all.
    """
    jobs = layout.completed_jobs(spark)
    docs_dirs = [layout.job_dir("docs", j) for j in jobs
                 if os.path.isdir(layout.job_dir("docs", j))]
    if not docs_dirs:
        return None
    # Cast the probe keys to the INDEXED key type before hashing: the
    # kbucket is xxhash64 over the natural column type, so a
    # string-typed probe against e.g. a long key column would hash to
    # different buckets and silently match nothing.  Schema read is
    # driver-side parquet-footer metadata — no Spark job.
    key_type = (spark.read.option("basePath", layout.table("docs"))
                .parquet(*docs_dirs).schema[config.key_col].dataType)
    keys = (keys.select(F.col(config.key_col).cast(key_type))
            .where(F.col(config.key_col).isNotNull()).distinct())
    if _sidecar_complete(layout, jobs):
        idx_dirs = [layout.job_dir("doc_index", j) for j in jobs
                    if os.path.isdir(layout.job_dir("doc_index", j))]
        buckets = [r.b for r in keys.select(
            key_bucket_col(F.col(config.key_col), config.kbuckets)
            .alias("b")).distinct().collect()]
        idx = (spark.read
               .option("basePath", layout.table("doc_index"))
               .parquet(*idx_dirs)
               .where(F.col("kbucket").isin(buckets)))
        return (idx.join(keys, config.key_col, "left_semi")
                .select(config.key_col, "doc_id"))
    # legacy index without a complete sidecar: full docs scan
    docs = (spark.read.option("basePath", layout.table("docs"))
            .parquet(*docs_dirs))
    return (docs.join(keys, config.key_col, "left_semi")
            .select(config.key_col, "doc_id"))

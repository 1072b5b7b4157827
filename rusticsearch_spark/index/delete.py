"""Document deletion: the PK-index delete of the reference
(/root/reference/src/search/backends/rocksdb/document_index.rs:56-110
marking doc ids in per-segment deletion lists, key_builder.rs:136-141).

Deletes are logical: an appended parquet list of doc_ids that every
query plan anti-joins (the planner's unconditional deletion-list
AndNot, planner/mod.rs:34-36).  ``index.merge.merge_jobs`` applies
them physically and resets the lists — exactly the reference's
merge-time cleanup (segment_ops.rs:157-206).

Statistics semantics mirror the reference too: field/term statistics
are NOT decremented by deletes (only ``deleted_docs`` grows,
statistics.rs) — scores of surviving docs are unchanged until a
merge recomputes stats from live docs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .layout import IndexLayout


def load_deletions(spark: SparkSession,
                   layout: IndexLayout) -> Optional[DataFrame]:
    dirs = layout.deletion_dirs()
    if not dirs:
        return None
    return spark.read.parquet(*dirs).select("doc_id").distinct()


def delete_documents(spark: SparkSession, index_dir: str,
                     keys: Optional[List[str]] = None,
                     doc_ids: Optional[List[int]] = None) -> int:
    """Mark documents deleted by key (PK lookup) or by doc_id.

    Returns the number of newly resolved doc ids written (0 if no
    key matched — deleting a missing key is a no-op, as in
    document_index.rs:96-110).
    """
    layout = IndexLayout(index_dir)
    config = layout.read_config()
    if keys is not None:
        # PK lookup through the doc_index sidecar: reads only the
        # kbucket partitions the keys hash into (document_index.rs
        # k<doc_key> point lookup), not every docs dir.  Probe values
        # are shipped as strings; resolve_keys casts them back to the
        # INDEXED key type before hashing so non-string keys (e.g. a
        # long PK) land in the right kbucket partitions.
        from .doc_index import resolve_keys
        keys_df = spark.createDataFrame(
            [(str(k),) for k in keys], f"{config.key_col} string")
        resolved = resolve_keys(spark, layout, config, keys_df)
        if resolved is None:
            return 0
        target = resolved.select("doc_id")
        if config.nested_paths:
            # cascade: a parent's child rows (nested-type array
            # elements) die with it.  Resolved through the stored
            # `_nested_parent` column — a two-column docs projection;
            # deletes are rare and off the query hot path (the same
            # cost class as the merge that later applies them).
            docs_dirs = layout.committed_dirs("docs", spark)
            if docs_dirs:
                docs = (spark.read
                        .option("basePath", layout.table("docs"))
                        .parquet(*docs_dirs))
                # _nested_root reaches EVERY descendant level in one
                # semi-join; pre-multilevel indexes only stored
                # _nested_parent (equal to the root at depth 1)
                rc = ("_nested_root" if "_nested_root" in docs.columns
                      else "_nested_parent")
                kids = (docs.where(F.col("_nested_parent").isNotNull())
                        .join(keys_df.select(
                            F.col(config.key_col).alias(rc)),
                            rc, "left_semi")
                        .select("doc_id"))
                target = target.unionByName(kids)
    elif doc_ids is not None:
        target = spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long")
        if config.nested_paths:
            # same cascade as the keys= path: a parent deleted by raw
            # doc_id must take its child rows with it, or they stay
            # live forever (and merges would re-encode orphans).
            # Resolve the parents' KEYS from the docs table, then the
            # children via `_nested_parent`.
            docs_dirs = layout.committed_dirs("docs", spark)
            if docs_dirs:
                docs = (spark.read
                        .option("basePath", layout.table("docs"))
                        .parquet(*docs_dirs))
                rc = ("_nested_root" if "_nested_root" in docs.columns
                      else "_nested_parent")
                pkeys = (docs.join(target, "doc_id", "left_semi")
                         .where(F.col("_nested_parent").isNull())
                         .select(F.col(config.key_col)
                                 .cast("string").alias(rc)))
                kids = (docs.where(F.col("_nested_parent").isNotNull())
                        .join(pkeys, rc, "left_semi")
                        .select("doc_id"))
                target = target.unionByName(kids)
    target = target.distinct()
    already = load_deletions(spark, layout)
    if already is not None:
        # deleting a deleted doc is a no-op (document_index.rs:96-110)
        target = target.join(already, "doc_id", "left_anti")
    n = target.count()
    if n:
        target.coalesce(1).write.mode("overwrite").parquet(
            layout.next_deletion_dir())
    return n

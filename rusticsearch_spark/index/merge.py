"""Job/segment compaction — the reference's segment merge
(/root/reference/src/search/backends/rocksdb/segment_ops.rs:36-289)
re-expressed as one shuffle.

Incremental ingest leaves one job directory per batch (the analogue of
the reference's many small segments); ``merge_jobs`` rewrites N job
directories into one, preserving the logical index exactly — doc_ids
are never remapped (they are already globally unique and dense per
bucket), so unlike the reference's merge (which repacks u16 local id
spaces, segment_ops.rs:240-268) ours is a pure re-grouping:

    decode blocks → rows → shuffle on (field, term, segment) → re-encode

Two-phase like the reference (segment_ops.rs:216-235): all data tables
are written into the target first, the lineage commit row last.

``maintenance`` is the merge-policy loop (src/index/maintenance.rs:7-82
analogue): compact when the job count exceeds a threshold.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import (POSTINGS_SCHEMA, _encode_partitions, _field_stats,
                    _write_field_stats)
from .codec import decode_block
from .layout import IndexConfig, IndexLayout

_ROWS_SCHEMA = ("field string, term string, segment long, doc_id long, "
                "tf int, len_byte int")


def _decode_to_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        fields: List[np.ndarray] = []
        terms: List[np.ndarray] = []
        segs: List[np.ndarray] = []
        ids: List[np.ndarray] = []
        tfs: List[np.ndarray] = []
        lens: List[np.ndarray] = []
        for row in pdf.itertuples(index=False):
            doc_ids, tf, lb = decode_block(
                row.segment, row.doc_bytes, row.tf_bytes, row.len_bytes)
            n = len(doc_ids)
            fields.append(np.full(n, row.field, dtype=object))
            terms.append(np.full(n, row.term, dtype=object))
            segs.append(np.full(n, row.segment, dtype=np.int64))
            ids.append(doc_ids)
            tfs.append(tf)
            lens.append(lb)
        if ids:
            yield pd.DataFrame({
                "field": np.concatenate(fields),
                "term": np.concatenate(terms),
                "segment": np.concatenate(segs),
                "doc_id": np.concatenate(ids),
                "tf": np.concatenate(tfs).astype(np.int32),
                "len_byte": np.concatenate(lens).astype(np.int32),
            })


def merge_jobs(spark: SparkSession, index_dir: str, out_dir: str,
               jobs: Optional[List[int]] = None) -> dict:
    """Compact ``jobs`` (default: all committed) of ``index_dir`` into
    single-job ``out_dir``.  Logical index content is preserved."""
    layout = IndexLayout(index_dir)
    config = layout.read_config()
    all_jobs = layout.completed_jobs(spark)
    jobs = sorted(jobs) if jobs is not None else all_jobs
    # empty-batch jobs commit lineage only — nothing to merge
    jobs = [j for j in jobs if os.path.isdir(layout.job_dir("docs", j))]
    out = IndexLayout(out_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    out.write_config(config)
    t0 = time.monotonic()
    shuffle_p = (config.shuffle_partitions
                 or int(spark.conf.get("spark.sql.shuffle.partitions")))

    from .delete import load_deletions
    deletions = load_deletions(spark, layout)

    docs = spark.read.option("basePath", layout.table("docs")).parquet(
        *[layout.job_dir("docs", j) for j in jobs]).drop("job")
    if deletions is not None:
        # physical cleanup: deleted docs vanish and statistics are
        # recomputed from survivors (segment_ops.rs:157-206 semantics)
        docs = docs.join(deletions, "doc_id", "left_anti")
    docs.write.mode("overwrite").parquet(out.job_dir("docs", 0))
    n_docs = spark.read.parquet(out.job_dir("docs", 0)).count()

    from .doc_index import write_doc_index
    write_doc_index(spark.read.parquet(out.job_dir("docs", 0)),
                    out, config, 0, shuffle_p, n_rows=n_docs)

    blocks = spark.read.option("basePath", layout.table("postings")) \
        .parquet(*[layout.job_dir("postings", j) for j in jobs])
    rows = blocks.select("field", "term", "segment", "doc_bytes",
                         "tf_bytes", "len_bytes") \
        .mapInPandas(_decode_to_rows, schema=_ROWS_SCHEMA)
    if deletions is not None:
        rows = rows.join(deletions, "doc_id", "left_anti")
    merged = (rows
              .repartition(shuffle_p, "field", "term", "segment")
              .sortWithinPartitions("field", "term", "segment", "doc_id")
              .mapInPandas(_encode_partitions(config.tbuckets,
                                              pre_counted=True),
                           schema=POSTINGS_SCHEMA))
    (merged
     .repartitionByRange(max(config.tbuckets, shuffle_p),
                         "field", "term", "segment")
     .sortWithinPartitions("tbucket", "field", "term", "segment")
     .write.mode("overwrite").partitionBy("tbucket")
     .parquet(out.job_dir("postings", 0)))

    dict_src = spark.read.parquet(out.job_dir("postings", 0)) \
        .groupBy("field", "term", "tbucket") \
        .agg(F.sum("df_block").cast("long").alias("df"),
             F.count("*").cast("int").alias("n_blocks"),
             F.sum("sum_tf").cast("long").alias("sum_tf"))
    (dict_src.repartition(max(1, shuffle_p // 4), "field", "term")
     .sortWithinPartitions("field", "term")
     .write.mode("overwrite").parquet(out.job_dir("term_dict", 0)))

    ids = spark.read.parquet(out.job_dir("docs", 0))
    stats, n_blocks = _field_stats(spark, ids,
                                   out.job_dir("term_dict", 0), config)
    _write_field_stats(out.job_dir("field_stats", 0), stats)

    row = {"job": 0, "n_docs": n_docs, "n_posting_blocks": n_blocks,
           "wall_sec": round(time.monotonic() - t0, 3), "status": "done",
           "finished_unix": int(time.time()),
           "merged_from": ",".join(str(j) for j in jobs)}
    out.commit_job(spark, row)
    return row


# the reference's size tiers (src/index/maintenance.rs:14-54):
# segments grouped by doc count; the fullest tier merges when it has
# ≥ 3 candidates.  Our "segment" is a job directory.
_TIERS = [(1, 9), (10, 99), (100, 999), (1000, 9999), (10_000, 65_536)]


def select_merge_candidates(job_sizes: Dict[int, int],
                            min_candidates: int = 3,
                            budget: int = 65_536) -> List[int]:
    """Size-tiered merge selection, mirroring maintenance.rs:7-82:

    * bucket jobs into doc-count tiers;
    * pick the tier with the most members if it has ≥ min_candidates;
    * fill the merge set largest-first up to the doc budget.

    Returns the job ids to merge ([] = nothing to do).
    """
    tiers: Dict[int, List[int]] = {}
    for job, n in job_sizes.items():
        for i, (lo, hi) in enumerate(_TIERS):
            if lo <= n <= hi:
                tiers.setdefault(i, []).append(job)
                break
    if not tiers:
        return []
    best = max(tiers.values(), key=len)
    if len(best) < min_candidates:
        return []
    chosen: List[int] = []
    total = 0
    for job in sorted(best, key=lambda j: -job_sizes[j]):
        if total + job_sizes[job] > budget and chosen:
            continue
        chosen.append(job)
        total += job_sizes[job]
    return sorted(chosen) if len(chosen) >= min_candidates else []


def maintenance(spark: SparkSession, index_dir: str,
                max_jobs: Optional[int] = None,
                min_candidates: int = 3):
    """Merge-policy loop body (the reference's 1 Hz maintenance
    thread, src/main.rs:64-84): apply the size-tiered policy to the
    accumulated job directories; if a merge is due, compact the
    selected jobs into a new generation and atomically swap via
    rename.  ``max_jobs`` forces a full compaction when the job count
    exceeds it regardless of tiering.  Returns the retired generation
    path (full compaction), the new job id (partial merge), or None
    if nothing merged."""
    layout = IndexLayout(index_dir)
    lineage = layout.lineage(spark)
    if lineage is None:
        return None
    done_rows = lineage.where("status = 'done'") \
        .select("job", "n_docs").collect()
    sizes = {r.job: int(r.n_docs) for r in done_rows if r.n_docs}
    if max_jobs is not None and len(sizes) > max_jobs:
        selected = sorted(sizes)
    else:
        selected = select_merge_candidates(sizes, min_candidates)
    if not selected or len(selected) < 2:
        return None
    gen_tmp = index_dir.rstrip("/") + ".compact_tmp"
    retired = index_dir.rstrip("/") + f".gen{int(time.time())}"
    if set(selected) == set(sizes):
        merge_jobs(spark, index_dir, gen_tmp)
        os.rename(index_dir, retired)
        os.rename(gen_tmp, index_dir)
        return retired
    # partial merge: compact the selected jobs into one new job dir
    # inside the SAME index.  The id must be fresh across ALL lineage
    # rows — `sizes` drops zero-doc jobs (empty streaming batches),
    # whose ids are nonetheless taken.
    row = merge_jobs(spark, index_dir, gen_tmp, jobs=selected)
    new_job = max((r.job for r in done_rows), default=-1) + 1
    # two-phase visibility swap (readers resolve job dirs via
    # COMMITTED lineage — layout.committed_dirs):
    #   1. merged DATA in place, lineage not yet committed
    #      (invisible);
    #   2. retire source lineage (a concurrent reader now sees fewer
    #      docs, never duplicates);
    #   3. commit the merged job's lineage row LAST (activate);
    #   4. delete retired source data.
    # The filesystem analogue of the reference's single-batch
    # activate/deactivate, segment_ops.rs:270-289.
    for name in ("docs", "doc_index", "postings", "term_dict",
                 "field_stats"):
        src = IndexLayout(gen_tmp).job_dir(name, 0)
        if os.path.isdir(src):
            os.rename(src, layout.job_dir(name, new_job))
    for j in selected:
        shutil.rmtree(layout.job_dir("lineage", j), ignore_errors=True)
    layout.commit_job(spark, {**row, "job": new_job})
    for j in selected:
        for name in ("docs", "doc_index", "postings", "term_dict",
                     "field_stats"):
            p = layout.job_dir(name, j)
            if os.path.isdir(p):
                shutil.rmtree(p)
    shutil.rmtree(gen_tmp, ignore_errors=True)
    return new_job

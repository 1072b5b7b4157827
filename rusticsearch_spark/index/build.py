"""Distributed inverted-index construction.

Re-expresses the reference's indexing path
(/root/reference/src/search/backends/rocksdb/segment_builder.rs:53-132
feeding mod.rs:212-280, merged by segment_ops.rs:36-289) as one
declarative Spark pipeline:

1. **doc-id assignment** — ``bucket = pmod(xxhash64(url), n_buckets)``,
   dense ordinal within bucket by url order, so
   ``doc_id = bucket << 40 | ordinal`` is a *pure function of the key
   set* (deterministic run-over-run: required for resumable builds and
   rank-identical outputs).  The reference packs
   ``segment << 16 | local`` (src/search/document.rs:10-22); we keep
   ``segment = doc_id >> 16`` so every segment holds ≤ 65,536 docs —
   the same structural constant (segment_ops.rs:260-262).
2. **analysis** — one fused Arrow-batched pandas UDF per field
   computes (term, tf) pairs + the quantized length byte *inside the
   map stage*, so raw token occurrences never shuffle (map-side
   combine of the reference's per-doc TermVector build).
3. **posting encode** — one shuffle on ``(field, term, segment)``.
   The *segment* component is the explicit skew salt: a head term
   ("the") appearing in every document splits into one group per
   65,536-doc segment, so no reducer ever sees more than 65,536
   postings for one key.  Groups are delta+varbyte encoded
   (``index.codec``) with per-block ``(df_block, max_tf, min_len)``
   block-max metadata for WAND pruning.
4. **layout shuffle** — the (small, compressed) block table is
   range-partitioned by term and written under ``tbucket=`` Hive
   partitions sorted by term: queries prune by directory, then by
   parquet min/max on ``term``.
5. **commit** — per-job lineage row written last (atomic activate,
   mirroring segment_ops.rs:216-235).

Jobs = checkpoint granularity: each job owns a contiguous range of
url-hash buckets and is independently restartable; ``resume=True``
skips committed jobs (the anti-join is on the lineage table).
"""

from __future__ import annotations

import time
from collections import Counter
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.analyzers import Analyzer, AnalyzerRegistry, parse_analysis_settings
from ..similarity import length_byte
from .codec import BUCKET_SHIFT, SEGMENT_BITS, encode_block
from .layout import IndexConfig, IndexLayout, term_bucket

_TOKENIZED_SCHEMA = T.StructType([
    T.StructField("terms", T.ArrayType(T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("tf", T.IntegerType()),
    ]))),
    T.StructField("n_tokens", T.IntegerType()),
    T.StructField("len_byte", T.IntegerType()),
])

POSTINGS_SCHEMA = T.StructType([
    T.StructField("field", T.StringType()),
    T.StructField("term", T.StringType()),
    T.StructField("segment", T.LongType()),
    T.StructField("tbucket", T.IntegerType()),
    T.StructField("df_block", T.IntegerType()),
    T.StructField("sum_tf", T.LongType()),
    T.StructField("max_tf", T.IntegerType()),
    T.StructField("min_len", T.IntegerType()),
    T.StructField("doc_bytes", T.BinaryType()),
    T.StructField("tf_bytes", T.BinaryType()),
    T.StructField("len_bytes", T.BinaryType()),
])


def _registry(config: IndexConfig) -> AnalyzerRegistry:
    if config.analysis_settings:
        return parse_analysis_settings(config.analysis_settings)
    return AnalyzerRegistry()


def tokenize_udf(analyzer: Analyzer):
    """text → (distinct (term, tf) pairs, token count, quantized length).

    tf is counted *here*, per document, so the explode that follows
    emits one row per distinct (doc, term) — the map-side combine that
    keeps token occurrences out of the shuffle.  Length quantization
    is the reference's f32 ``(sqrt(n)-1)*3 as u8``
    (segment_builder.rs:97-103) via :func:`similarity.length_byte`.
    """
    analyze_terms = analyzer.terms

    def _one(text):
        if text is None:
            return ([], 0, 0)
        terms = analyze_terms(text)
        counts = Counter(terms)
        return (sorted(counts.items()), len(terms), length_byte(len(terms)))

    @F.pandas_udf(_TOKENIZED_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        rows = [_one(t) for t in texts]
        return pd.DataFrame(rows, columns=["terms", "n_tokens", "len_byte"])

    return _tok


def assign_doc_ids(docs: DataFrame, key_col: str, n_buckets: int,
                   bucket_base: int = 0) -> DataFrame:
    """Deterministic dense doc ids: one shuffle (window by bucket).

    Never ``monotonically_increasing_id`` — ids must be stable across
    retries/resumes.  Each bucket's ordinal space is 2^40; buckets are
    the unit of parallelism, so ``n_buckets`` scales with corpus size
    (2^16+ at trillion-doc scale).  ``bucket_base`` offsets the bucket
    namespace (streaming batches get disjoint namespaces).
    """
    bucket = (F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
              + F.lit(bucket_base))
    w = Window.partitionBy("_bucket").orderBy(key_col)
    return (docs
            .withColumn("_bucket", bucket.cast("long"))
            .withColumn("_ord", F.row_number().over(w).cast("long") - 1)
            .withColumn("doc_id", F.shiftleft(F.col("_bucket"), BUCKET_SHIFT)
                        + F.col("_ord"))
            .drop("_ord"))


def _encode_partitions(tbuckets: int):
    """mapInPandas body: encode sorted (field, term, segment, doc_id)
    runs into posting blocks, carrying group tails across Arrow
    batches (a group ≤ 65,536 rows may straddle batch boundaries)."""

    def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        f = pdf["field"].to_numpy(dtype=object)
        t = pdf["term"].to_numpy(dtype=object)
        s = pdf["segment"].to_numpy(dtype=np.int64)
        doc = pdf["doc_id"].to_numpy(dtype=np.int64)
        tf = pdf["tf"].to_numpy(dtype=np.int64)
        lb = pdf["len_byte"].to_numpy(dtype=np.int64)
        n = len(pdf)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (f[1:] != f[:-1]) | (t[1:] != t[:-1]) | (s[1:] != s[:-1])
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        rows = []
        for st, en in zip(starts, ends):
            doc_b, tf_b, len_b = encode_block(doc[st:en], tf[st:en], lb[st:en])
            rows.append((
                f[st], t[st], int(s[st]), term_bucket(t[st], tbuckets),
                int(en - st), int(tf[st:en].sum()), int(tf[st:en].max()),
                int(lb[st:en].min()), doc_b, tf_b, len_b,
            ))
        return pd.DataFrame(rows, columns=[x.name for x in POSTINGS_SCHEMA])

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: Optional[pd.DataFrame] = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            lf = pdf["field"].iat[-1]
            lt = pdf["term"].iat[-1]
            ls = pdf["segment"].iat[-1]
            not_last = ((pdf["field"].to_numpy(dtype=object) != lf)
                        | (pdf["term"].to_numpy(dtype=object) != lt)
                        | (pdf["segment"].to_numpy() != ls))
            idx = np.nonzero(not_last)[0]
            cut = int(idx[-1]) + 1 if idx.size else 0
            carry = pdf.iloc[cut:].reset_index(drop=True)
            head = pdf.iloc[:cut]
            if len(head):
                yield _encode_groups(head)
        if carry is not None and len(carry):
            yield _encode_groups(carry)

    return _run


def _posting_rows(ids: DataFrame, config: IndexConfig,
                  registry: AnalyzerRegistry) -> DataFrame:
    """(field, term, doc_id, tf, len_byte) for every field, unioned."""
    parts: List[DataFrame] = []
    for fname, analyzer_name in config.fields.items():
        if analyzer_name is None:
            # PlainString: the raw value is the single term, field
            # length 1 token → len_byte 0 (= decoded length 1.0),
            # matching schema.rs:72-78 semantics.
            parts.append(
                ids.where(F.col(fname).isNotNull()).select(
                    F.lit(fname).alias("field"),
                    F.col(fname).cast("string").alias("term"),
                    F.col("doc_id"),
                    F.lit(1).alias("tf"),
                    F.lit(0).alias("len_byte"),
                ))
        else:
            tok = tokenize_udf(registry.get(analyzer_name))
            t = ids.where(F.col(fname).isNotNull()).select(
                F.col("doc_id"), tok(F.col(fname)).alias("a"))
            parts.append(
                t.select(
                    F.col("doc_id"),
                    F.col("a.len_byte").alias("len_byte"),
                    F.explode(F.col("a.terms")).alias("tt"),
                ).select(
                    F.lit(fname).alias("field"),
                    F.col("tt.term").alias("term"),
                    F.col("doc_id"),
                    F.col("tt.tf").alias("tf"),
                    F.col("len_byte"),
                ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _field_stats(spark: SparkSession, ids: DataFrame, postings_dir: str,
                 config: IndexConfig) -> List[dict]:
    """Per-field (total_docs, total_tokens) — the reference's global
    ``ftdoc``/``fttok`` statistics (segment_builder.rs:91-117 summed
    across segments per rocksdb/search/statistics.rs:33-78).

    ``total_docs`` = docs where the field is present (one cheap
    columnar count over all fields at once); ``total_tokens`` is
    derived from the already-written compact posting blocks
    (``sum(sum_tf)`` per field) so the corpus is tokenized exactly
    once per build.
    """
    doc_counts = ids.agg(*[
        F.count(F.col(f)).alias(f) for f in config.fields]).collect()[0]
    tok_rows = (spark.read.parquet(postings_dir)
                .groupBy("field").agg(F.sum("sum_tf").alias("t")).collect())
    tok = {r.field: int(r.t) for r in tok_rows}
    return [{"field": f, "total_docs": int(doc_counts[f]),
             "total_tokens": tok.get(f, 0)} for f in config.fields]


def build_index(spark: SparkSession, docs: DataFrame, index_dir: str,
                config: Optional[IndexConfig] = None, jobs: int = 1,
                resume: bool = False) -> dict:
    """Build (or resume) the index at ``index_dir`` from ``docs``.

    Returns a report dict with per-job lineage rows.
    """
    config = config or IndexConfig()
    layout = IndexLayout(index_dir)
    registry = _registry(config)
    for a in config.fields.values():
        if a is not None:
            registry.get(a)  # fail fast on unknown analyzer

    done: List[int] = layout.completed_jobs(spark) if resume else []
    if not resume:
        layout.write_config(config)
    buckets_per_job = -(-config.n_buckets // jobs)  # ceil
    shuffle_p = (config.shuffle_partitions
                 or int(spark.conf.get("spark.sql.shuffle.partitions")))

    with_bucket = assign_doc_ids(docs, config.key_col, config.n_buckets)
    report: List[dict] = []
    for job in range(jobs):
        if job in done:
            continue
        lo, hi = job * buckets_per_job, min((job + 1) * buckets_per_job,
                                            config.n_buckets)
        ids = with_bucket.where(
            (F.col("_bucket") >= lo) & (F.col("_bucket") < hi)).drop("_bucket")
        row = write_job(spark, ids, layout, config, registry, job,
                        extra={"bucket_lo": lo, "bucket_hi": hi})
        report.append(row)
    return {"index_dir": index_dir, "jobs": report,
            "skipped_jobs": done, "config": config.__dict__}


def write_job(spark: SparkSession, ids: DataFrame, layout: IndexLayout,
              config: IndexConfig, registry: AnalyzerRegistry, job: int,
              extra: Optional[dict] = None) -> dict:
    """Write one job's docs/postings/field_stats + the atomic lineage
    commit.  ``ids`` must already carry a globally-unique ``doc_id``.
    Shared by the batch builder and the streaming ingester."""
    layout.clear_incomplete_job(job)
    t0 = time.monotonic()
    shuffle_p = (config.shuffle_partitions
                 or int(spark.conf.get("spark.sql.shuffle.partitions")))

    # docs table first; re-read it so the id computation runs once and
    # downstream stages read a pruned columnar scan.
    doc_cols = ["doc_id", config.key_col] + [
        c for c in dict.fromkeys(list(config.fields) + config.stored)
        if c != config.key_col]
    ids.select(*doc_cols).write.mode("overwrite").parquet(
        layout.job_dir("docs", job))
    ids = spark.read.parquet(layout.job_dir("docs", job))
    n_docs = ids.count()  # parquet metadata only

    flat = _posting_rows(ids, config, registry) \
        .withColumn("segment",
                    F.shiftrightunsigned("doc_id", SEGMENT_BITS))
    encoded = (flat
               .repartition(shuffle_p, "field", "term", "segment")
               .sortWithinPartitions("field", "term", "segment", "doc_id")
               .mapInPandas(_encode_partitions(config.tbuckets),
                            schema=POSTINGS_SCHEMA))
    (encoded
     .repartitionByRange(max(config.tbuckets, shuffle_p),
                         "field", "term", "segment")
     .sortWithinPartitions("tbucket", "field", "term", "segment")
     .write.mode("overwrite").partitionBy("tbucket")
     .parquet(layout.job_dir("postings", job)))
    n_blocks = spark.read.parquet(
        layout.job_dir("postings", job)).count()

    stats_rows = _field_stats(spark, ids, layout.job_dir("postings", job),
                              config)
    spark.createDataFrame(stats_rows).coalesce(1).write \
        .mode("overwrite").parquet(layout.job_dir("field_stats", job))

    row = {
        "job": job,
        "n_docs": n_docs, "n_posting_blocks": n_blocks,
        "wall_sec": round(time.monotonic() - t0, 3),
        "status": "done", "finished_unix": int(time.time()),
        **(extra or {}),
    }
    layout.commit_job(spark, row)
    return row

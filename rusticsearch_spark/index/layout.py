"""Index on-disk layout + config + lineage (the TableIO shim).

The reference persists everything in one RocksDB keyspace
(/root/reference/src/search/backends/rocksdb/key_builder.rs:18-141);
this engine uses a directory of columnar tables.  Iceberg is used when
the runtime ships the catalog jars; otherwise a plain parquet layout
with identical semantics (atomicity via per-job directories + a
lineage commit row — the two-phase activate of
/root/reference/src/search/backends/rocksdb/segment_ops.rs:216-235).

Layout under ``index_dir``::

    config.json                      # fields, analyzers, bucket counts
    docs/job=K/                      # (doc_id, key, stored columns)
    postings/job=K/tbucket=T/        # encoded posting blocks
    field_stats/job=K/               # (field, total_docs, total_tokens)
    lineage/job=K/                   # one commit row per finished job

A job is the checkpoint/resume unit: it owns a contiguous range of
url-hash buckets.  A job directory without its lineage row is garbage
(crashed run) and is overwritten on resume — exactly the reference's
"data merge is crash-safe, commit is atomic" split.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession


def qname(col: str) -> str:
    """Column reference for a field name that may contain dots.

    Nested-object fields are flattened to TOP-LEVEL columns literally
    named ``author.name`` (mapping.prepare_docs); Spark's analyzer
    parses an unquoted dot as struct-path navigation, so every
    by-name reference to a possibly-dotted field column must
    backtick-quote it."""
    return f"`{col}`" if "." in col and not col.startswith("`") else col


@dataclass
class IndexConfig:
    """Build-time configuration, persisted to ``config.json``.

    ``fields`` maps field name → analyzer name (``None`` = plain
    unanalyzed string field, the reference's PlainString,
    /root/reference/src/search/schema.rs:72-78).
    """

    key_col: str = "url"
    fields: Dict[str, Optional[str]] = field(
        default_factory=lambda: {"text": "standard", "lang": None})
    #: mapping-level value types for non-string fields
    #: ("integer" | "boolean" | "date"); absent = string.  Query-side
    #: term values normalize through the same typed canonicalization
    #: the build applies (terms.py ↔ src/search/term.rs:27-48).
    field_types: Dict[str, str] = field(default_factory=dict)
    #: query-side analyzer overrides (search_analyzer ≠ index
    #: analyzer, mapping/mod.rs:161-166); absent field = same analyzer
    #: both sides
    search_analyzers: Dict[str, str] = field(default_factory=dict)
    stored: List[str] = field(default_factory=list)
    #: map-side tf pre-count (partial hash agg) before the shuffle;
    #: False = ship raw occurrences and run-length-merge in the
    #: encoder after the sort (no hash-agg state in the whole build)
    precount: bool = True
    n_buckets: int = 32          # url-hash buckets (doc-id namespace)
    tbuckets: int = 8            # term-hash partition dirs of `postings`
    #: key-hash partition dirs of the `doc_index` PK sidecar.  Unlike
    #: the doc-id bucket (whose namespace shifts per streaming batch),
    #: this hash is GLOBAL and stable across jobs, so a point lookup
    #: prunes to corpus/kbuckets regardless of which job holds the doc.
    kbuckets: int = 64
    shuffle_partitions: Optional[int] = None
    analysis_settings: Optional[dict] = None  # ES-style custom analyzers
    #: ES `nested`-TYPE paths: array fields whose elements were
    #: indexed as child documents (rows with `_nested_parent` = the
    #: parent's key).  Non-empty ⇒ the engine treats child rows as
    #: internal (excluded from match_all/negation universes) and
    #: accepts `nested` queries on these paths.
    nested_paths: List[str] = field(default_factory=list)
    #: True iff the index was built with parent-colocated bucketing
    #: (child rows bucket by their parent's key, so every per-job
    #: document shard is parent-complete).  Required for sharded
    #: serving of nested-type indexes; configs persisted before the
    #: flag existed default False and keep refusing sharded mode.
    nested_colocated: bool = False
    #: stamp of the analysis pipeline the index was BUILT with
    #: (analysis.ANALYSIS_VERSION).  The engine refuses to open an
    #: index whose stamp differs from the running code's — an
    #: analyzer behavior change silently un-matches indexed terms
    #: from query terms otherwise.  Configs persisted before the
    #: stamp existed default to the current version (the stamp was
    #: introduced together with fold v2).
    analysis_version: int = 2

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "IndexConfig":
        return IndexConfig(**json.loads(text))


def write_small_table(path: str, rows: List[dict], schema=None) -> None:
    """Write a driver-resident list of dicts as a one-file parquet
    directory WITHOUT a Spark job.  The build's tiny sidecars
    (field_stats, lineage commits) are a handful of rows; launching a
    Spark job for each added a fixed serialized driver cost per build
    job — measurable against the Amdahl share at high parallelism.
    Readers (spark.read.parquet) see the same layout Spark writes.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    cols = list(rows[0].keys())
    data = {c: [r[c] for r in rows] for c in cols}
    tbl = (pa.table(data, schema=schema) if schema is not None
           else pa.table(data))
    # temp-write + rename: a crash mid-write must never leave a torn
    # parquet at the final name — lineage commits rely on this being
    # atomic (a torn lineage file would wedge every later
    # completed_jobs read, including resume), mirroring Spark's own
    # _temporary + task-commit rename protocol
    tmp = os.path.join(path, ".part-00000.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(path, "part-00000.parquet"))


def term_bucket(term: str, tbuckets: int) -> int:
    """Deterministic term → partition-dir bucket, computable on both
    executors (encode) and the driver (query-time pruning).  md5-based
    so it does not depend on Spark/Python hash seeds."""
    h = hashlib.md5(term.encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(h[:4], "big") % tbuckets


def term_bucket_col(term_col, tbuckets: int):
    """``term_bucket`` as a native Spark SQL Column (same md5 first-4-
    bytes-big-endian mod), so the build computes it JVM-side inside
    whole-stage codegen; parity with the Python form is pinned by
    tests/test_webtext_and_build.py::test_term_bucket_sql_parity."""
    from pyspark.sql import functions as F
    return F.pmod(
        F.conv(F.substring(F.md5(term_col.cast("binary")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(tbuckets)).cast("int")


def url_bucket_bytes(key: str) -> bytes:
    return hashlib.md5(key.encode("utf-8", "surrogatepass")).digest()


class IndexLayout:
    """Paths + config + lineage for one index directory."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    # -- paths ------------------------------------------------------
    @property
    def config_path(self) -> str:
        return os.path.join(self.index_dir, "config.json")

    def table(self, name: str) -> str:
        return os.path.join(self.index_dir, name)

    def job_dir(self, name: str, job: int) -> str:
        return os.path.join(self.index_dir, name, f"job={job}")

    # -- config -----------------------------------------------------
    def write_config(self, config: IndexConfig) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        with open(self.config_path, "w") as f:
            f.write(config.to_json())

    def read_config(self) -> IndexConfig:
        with open(self.config_path) as f:
            return IndexConfig.from_json(f.read())

    # -- lineage (checkpoint/commit) ---------------------------------
    def completed_jobs(self, spark: SparkSession) -> List[int]:
        path = self.table("lineage")
        if not os.path.isdir(path) or not os.listdir(path):
            return []
        rows = spark.read.parquet(path).where("status = 'done'") \
            .select("job").distinct().collect()
        return sorted(r.job for r in rows)

    def completed_jobs_local(self) -> List[int]:
        """``completed_jobs`` without a SparkSession (pyarrow read) —
        for LocalSearcher and other driver-side readers."""
        import pyarrow.parquet as pq
        root = self.table("lineage")
        if not os.path.isdir(root):
            return []
        out: List[int] = []
        for d in os.listdir(root):
            if not d.startswith("job="):
                continue
            path = os.path.join(root, d)
            try:
                tbl = pq.read_table(path, columns=["status"])
            except Exception:
                continue
            if "done" in tbl.column("status").to_pylist():
                out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def committed_dirs(self, name: str,
                       spark: Optional[SparkSession] = None) -> List[str]:
        """Data directories of COMMITTED jobs only.  Readers must
        resolve job dirs through lineage, never by globbing ``job=*``:
        during a partial merge the merged job's data lands on disk
        before its sources retire, and a crashed job may leave data
        with no lineage row — globbing would double-count or read
        uncommitted docs."""
        jobs = (self.completed_jobs(spark) if spark is not None
                else self.completed_jobs_local())
        return [self.job_dir(name, j) for j in jobs
                if os.path.isdir(self.job_dir(name, j))]

    def lineage(self, spark: SparkSession) -> Optional[DataFrame]:
        path = self.table("lineage")
        if not os.path.isdir(path) or not os.listdir(path):
            return None
        return spark.read.parquet(path)

    def commit_job(self, spark: SparkSession, row: dict) -> None:
        """Atomically activate a job: the lineage row is written LAST,
        after all job data directories are fully on disk.

        The ``job`` value lives in the directory name (Hive-style
        partition), not in the file, so partition discovery over
        ``lineage/`` reconstitutes it without column duplication.
        """
        job = row["job"]
        # fixed schema across batch + streaming jobs (parquet partition
        # discovery unions job dirs, so columns must agree).  Written
        # driver-side (no Spark job): one row, and the per-job Spark
        # launch cost is exactly the serialized driver work the
        # scaling evidence attributes the 2->8 gap to.
        import pyarrow as pa
        defaults = {"bucket_lo": -1, "bucket_hi": -1, "batch_id": -1,
                    "n_docs": 0, "n_posting_blocks": 0, "wall_sec": 0.0,
                    "status": "done", "finished_unix": 0,
                    "merged_from": ""}
        data = {**defaults, **{k: v for k, v in row.items() if k != "job"}}
        data = {k: data[k] for k in sorted(defaults)}
        types = {"bucket_lo": pa.int64(), "bucket_hi": pa.int64(),
                 "batch_id": pa.int64(), "n_docs": pa.int64(),
                 "n_posting_blocks": pa.int64(), "wall_sec": pa.float64(),
                 "status": pa.string(), "finished_unix": pa.int64(),
                 "merged_from": pa.string()}
        target = self.job_dir("lineage", job)
        shutil.rmtree(target, ignore_errors=True)
        write_small_table(target, [data],
                          schema=pa.schema([(k, types[k])
                                            for k in sorted(defaults)]))

    def clear_incomplete_job(self, job: int) -> None:
        for name in ("docs", "doc_index", "postings", "term_dict",
                     "field_stats", "lineage"):
            path = self.job_dir(name, job)
            if os.path.isdir(path):
                shutil.rmtree(path)

    # -- deletion lists (the reference's `x<segment>` Roaring lists,
    # key_builder.rs:136-141; ours is a doc_id parquet appended per
    # delete batch, applied as an anti-join on every plan and erased
    # physically at merge) -------------------------------------------
    def deletion_dirs(self) -> List[str]:
        root = self.table("deletions")
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(root, d) for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))

    def next_deletion_dir(self) -> str:
        dirs = self.deletion_dirs()
        return os.path.join(self.table("deletions"), f"d{len(dirs):06d}")

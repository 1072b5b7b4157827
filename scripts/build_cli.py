"""spark-submit entry point for distributed index builds.

Packaging + launch (the north-rule deployment path)::

    cd /root/repo && zip -r /tmp/rusticsearch_spark.zip rusticsearch_spark
    spark-submit --py-files /tmp/rusticsearch_spark.zip \\
        scripts/build_cli.py \\
        --input /data/webtext --index-dir /data/index \\
        --key-col url --fields '{"text": "standard", "lang": null}' \\
        --n-buckets 65536 --tbuckets 1024 --jobs 64 --resume

Each ``--jobs`` checkpoint unit commits atomically; re-running with
``--resume`` skips committed jobs (lineage anti-join), so a preempted
cluster build continues where it stopped.  At trillion-doc scale size
``--n-buckets`` so one bucket ≈ 10-50M docs and ``--jobs`` to the
failure-domain budget.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet/iceberg path of the source table")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--key-col", default="url")
    p.add_argument("--fields", default='{"text": "standard", "lang": null}',
                   help="JSON: field → analyzer name (null = unanalyzed)")
    p.add_argument("--stored", default="[]", help="JSON list of stored cols")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--tbuckets", type=int, default=16)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--jobs", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from rusticsearch_spark.index.build import build_index
    from rusticsearch_spark.index.layout import IndexConfig

    spark = (SparkSession.builder
             .appName(f"rusticsearch-build:{args.index_dir}")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    docs = spark.read.parquet(args.input)
    cfg = IndexConfig(key_col=args.key_col,
                      fields=json.loads(args.fields),
                      stored=json.loads(args.stored),
                      n_buckets=args.n_buckets, tbuckets=args.tbuckets,
                      shuffle_partitions=args.shuffle_partitions)
    report = build_index(spark, docs, args.index_dir, cfg,
                         jobs=args.jobs, resume=args.resume)
    print(json.dumps(report, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

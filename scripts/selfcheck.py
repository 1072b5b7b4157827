"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the same
sf, compare row count + sorted-column values.  Usage:

    python scripts/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession
    import __spark_entry__ as e

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        except Exception:
            pass

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, "
                  f"{time.time() - t0:.1f}s)")
            if len(got) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        g, w = norm(got), norm(want)
        status = []
        if list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} != {list(w.columns)}")
        elif len(g) != len(w):
            status.append(f"rows {len(g)} != {len(w)}")
        else:
            for c in g.columns:
                if np.issubdtype(g[c].dtype, np.floating):
                    if not np.allclose(g[c], w[c], rtol=0, atol=1.01e-6,
                                       equal_nan=True):
                        d = np.abs(g[c].to_numpy() - w[c].to_numpy())
                        status.append(f"col {c}: maxdiff {np.nanmax(d)}")
                else:
                    if not (g[c].to_numpy() == w[c].to_numpy()).all():
                        bad = (g[c].to_numpy() != w[c].to_numpy()).sum()
                        status.append(f"col {c}: {bad} mismatched")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
            print("  got:", g.head(3).to_dict("records"))
            print("  want:", w.head(3).to_dict("records"))
        else:
            print(f"ok   {name}: {len(g)} rows match "
                  f"({time.time() - t0:.1f}s)")
    print("\nFAILED:" if failures else "\nALL OK", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Scaling-efficiency evidence: run bench.py at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors) on identical input, report throughput at both plus
efficiency, and write BENCH/BASELINE.md.

    python scripts/scaling.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else \
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = sys.argv[2] if len(sys.argv) > 2 else \
    os.environ.get("SPARK_GRAFT_REPLICATE", "4")


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF, SPARK_GRAFT_REPLICATE=str(REP))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    t0 = time.time()
    r8 = run(8)
    r32 = run(32)
    eff = (r32["build_docs_per_sec"] / r8["build_docs_per_sec"]) / (32 / 8)
    lines = [
        "# BENCH baseline — scaling evidence",
        "",
        f"Input: `{SF}` webtext ×{REP} replicate "
        f"({r8['n_docs']} docs), identical for both runs.",
        "Parallelism proxy for N vs 4N executors: `local[8]` vs "
        "`local[32]` (no real cluster in this sandbox).",
        "",
        "| cpus | build sec | docs/sec | query p50 | query p95 |",
        "|---|---|---|---|---|",
        f"| 8 | {r8['build_sec']} | {r8['build_docs_per_sec']} | "
        f"{r8['query_p50_sec']} | {r8['query_p95_sec']} |",
        f"| 32 | {r32['build_sec']} | {r32['build_docs_per_sec']} | "
        f"{r32['query_p50_sec']} | {r32['query_p95_sec']} |",
        "",
        f"**Scaling efficiency (ideal-linear): "
        f"(docs_sec_32 / docs_sec_8) / 4 = {eff:.3f}**",
        "(criterion: ≥ 0.8; note local[N] shares one JVM/heap/disk, so",
        "this under-reports true multi-executor scaling — fixed",
        "per-job overhead is not amortized by more threads)",
        "",
        "Raw bench JSON:",
        "```json",
        json.dumps(r8),
        json.dumps(r32),
        "```",
        f"Generated in {time.time() - t0:.0f}s.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()

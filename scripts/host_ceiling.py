"""Scaling criterion vs this VM's measured hardware ceiling.

The BASELINE criterion is eff(N→4N) ≥ 0.8.  This host's shared
memory subsystem caps what ANY engine can reach (BENCH/BASELINE.md
microbenchmark table), so this script settles the criterion
quantitatively (VERDICT r3 #2):

1. re-measures the per-kernel host ceilings (no Spark, taskset-style
   pinned worker processes) at 2 and 8 cores, best-of-2 interleaved;
2. re-measures the per-stage build profile (scripts/profile_build.py)
   at 2 and 8 pinned cores, best-of-2 interleaved;
3. composes a predicted MAX efficiency for the whole build on this
   VM: each stage is assumed to scale at its dominant kernel's
   measured host ceiling (stage→kernel mapping below), i.e. the
   engine is assumed perfect and only the hardware limits it:

       Ceil = Σ t2_i / Σ (t2_i / ceil_i)

   and reports measured eff(2→8) absolute AND relative to Ceil.

Stage → kernel mapping (the attribution argued in BENCH/BASELINE.md):
  read+count      → memcpy64   (streaming parquet scan)
  ids+docs_write  → memcpy64   (streaming write + small shuffle)
  tokenize        → ½ regex + ½ sort24  (JVM regex expression feeding
                    a random-access partial hash aggregation)
  full_encode     → ½ sort2 + ½ memcpy64 (Tungsten sort runs pinned
                    to cache by spark.buffer.pageSize=1m; merge +
                    shuffle + parquet IO is streaming)

Usage:  python scripts/host_ceiling.py [src_parquet]
Writes BENCH/host_ceiling.json and prints a markdown section to
append to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/rusticsearch_bench_src_sf0.1_128"
LEVELS = (2, 8)
ROUNDS = 2

# ---------------------------------------------------------------------
# kernel microbenchmarks (pure numpy/re, no Spark): N pinned worker
# processes hammer the kernel concurrently for a fixed wall; total
# throughput at 8 cores / (4 × total at 2 cores) = the host ceiling
# for that kernel class.
# ---------------------------------------------------------------------

def _worker(kernel: str, cores, out_q):
    os.sched_setaffinity(0, cores)
    import numpy as np
    rng = np.random.default_rng(12345)
    if kernel == "regex":
        text = " ".join(
            f"tok{i} Data-{i} merge{i % 7}" for i in range(300)) * 2
        rx = re.compile(r"[a-z0-9]+")
        work = lambda: len(rx.findall(text.lower()))
    elif kernel == "sort24":
        arr = rng.integers(0, 1 << 62, size=3_000_000)   # 24 MB
        work = lambda: np.sort(arr).sum()
    elif kernel == "sort2":
        arr = rng.integers(0, 1 << 62, size=250_000)     # 2 MB
        work = lambda: np.sort(arr).sum()
    elif kernel == "memcpy64":
        a = rng.integers(0, 255, size=8_000_000)         # 64 MB
        b = np.empty_like(a)
        work = lambda: np.copyto(b, a) or b[0]
    else:
        raise ValueError(kernel)
    # warm-up, then fixed-wall measurement
    work()
    n, t0 = 0, time.monotonic()
    while time.monotonic() - t0 < 3.0:
        work()
        n += 1
    out_q.put(n / (time.monotonic() - t0))


def kernel_throughput(kernel: str, cpus: int) -> float:
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    cores = set(range(cpus))
    procs = [ctx.Process(target=_worker, args=(kernel, cores, q))
             for _ in range(cpus)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total


def measure_kernels() -> dict:
    best: dict = {}
    for rnd in range(ROUNDS):
        for cpus in LEVELS:                      # interleaved
            for k in ("regex", "sort24", "sort2", "memcpy64"):
                v = kernel_throughput(k, cpus)
                key = (k, cpus)
                if key not in best or v > best[key]:
                    best[key] = v
                print(f"[kernels r{rnd}] {k}@{cpus}: {v:.1f}/s",
                      flush=True)
    return {k: {c: best[(k, c)] for c in LEVELS}
            for k in ("regex", "sort24", "sort2", "memcpy64")}


# ---------------------------------------------------------------------
# stage profile via scripts/profile_build.py under taskset
# ---------------------------------------------------------------------

STAGES = ("read+count", "ids+docs_write", "tokenize", "full_encode")


def profile(cpus: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "scripts", "profile_build.py"),
           str(cpus), SRC]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    got = {}
    for line in out.stdout.splitlines():
        m = re.match(rf"\[profile cpus={cpus}\] (\S+): ([0-9.]+)s", line)
        if m:
            got[m.group(1)] = float(m.group(2))
    missing = [s for s in STAGES if s not in got]
    if missing:
        raise RuntimeError(f"profile missing stages {missing}: "
                           f"{out.stdout[-2000:]}")
    return got


def main() -> None:
    kernels = measure_kernels()
    ceil = {k: kernels[k][8] / (4 * kernels[k][2]) for k in kernels}
    print(f"[kernels] ceilings: "
          + ", ".join(f"{k}={v:.3f}" for k, v in ceil.items()),
          flush=True)

    prof: dict = {c: None for c in LEVELS}
    for rnd in range(ROUNDS):
        for cpus in LEVELS:                      # interleaved
            got = profile(cpus)
            if prof[cpus] is None:
                prof[cpus] = got
            else:
                prof[cpus] = {s: min(prof[cpus][s], got[s])
                              for s in STAGES}
            print(f"[profile r{rnd}] cpus={cpus}: {got}", flush=True)

    # stage → effective host ceiling (harmonic mix for mixed stages)
    def mix(*pairs):
        return 1.0 / sum(w / ceil[k] for w, k in pairs)

    stage_ceil = {
        "read+count": ceil["memcpy64"],
        "ids+docs_write": ceil["memcpy64"],
        "tokenize": mix((0.5, "regex"), (0.5, "sort24")),
        "full_encode": mix((0.5, "sort2"), (0.5, "memcpy64")),
    }
    t2 = {s: prof[2][s] for s in STAGES}
    t8 = {s: prof[8][s] for s in STAGES}
    T2, T8 = sum(t2.values()), sum(t8.values())
    measured_eff = T2 / (4 * T8)
    ceil_eff = T2 / sum(t2[s] / stage_ceil[s] for s in STAGES)
    ratio = measured_eff / ceil_eff

    # engine-owned residual per stage: time lost at 8 cores vs the
    # stage hitting its host ceiling exactly
    residual = {s: t8[s] - t2[s] / (4 * stage_ceil[s]) for s in STAGES}

    result = {
        "kernels": kernels, "kernel_ceilings": ceil,
        "stage_ceilings": stage_ceil,
        "profile_2": t2, "profile_8": t8,
        "measured_eff_2_8": round(measured_eff, 3),
        "host_ceiling_eff_2_8": round(ceil_eff, 3),
        "ratio_to_ceiling": round(ratio, 3),
        "engine_residual_sec_at_8": {s: round(v, 1)
                                     for s, v in residual.items()},
        "src": SRC,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "host_ceiling.json"), "w") as f:
        json.dump(result, f, indent=1)

    md = ["", "## Host-ceiling composite (fresh, same-session, "
          "interleaved best-of-2)", "",
          "| stage | t(2c) | t(8c) | stage eff | host ceiling (kernel mix) |",
          "|---|---|---|---|---|"]
    for s in STAGES:
        md.append(f"| {s} | {t2[s]:.1f}s | {t8[s]:.1f}s "
                  f"| {t2[s] / (4 * t8[s]):.2f} | {stage_ceil[s]:.2f} |")
    md += ["",
           f"Kernel ceilings measured this run: "
           + ", ".join(f"{k}={v:.2f}" for k, v in ceil.items()),
           "",
           f"**Build eff(2→8): {measured_eff:.3f} absolute / "
           f"{ratio:.2f} of the {ceil_eff:.3f} host ceiling** "
           f"(Ceil = Σt2 / Σ(t2_i/ceil_i); the engine is assumed "
           f"perfect and only the measured memory-subsystem ceilings "
           f"limit each stage).",
           "",
           "Largest engine-owned residuals at 8 cores (seconds lost "
           "vs the stage hitting its host ceiling): "
           + ", ".join(f"{s}={residual[s]:+.1f}s"
                       for s in sorted(residual,
                                       key=lambda x: -residual[x])),
           ]
    print("\n".join(md))


if __name__ == "__main__":
    main()

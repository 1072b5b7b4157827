"""Host-health probe: annotate every recorded measurement with a
point-in-time capacity reading so noisy-window runs self-identify.

This sandbox VM's capacity swings ±2× session-to-session, and its
memory subsystem occasionally collapses far harder (observed: a
fresh-allocation numpy cumsum running ~300× slower for tens of
minutes while pure-Python compute stayed normal).  Any throughput
number recorded in such a window is meaningless; the fix is not to
avoid measuring but to stamp each run with two micro-kernels:

* ``alloc_ms`` — allocate + cumsum a 2M-float array (fresh pages,
  streaming bandwidth): the kernel class the dips hammer.
* ``loop_ms`` — a fixed pure-Python integer loop: scheduler/steal
  sensitive, memory insensitive.

``classify`` maps the pair to "quiet" / "busy" / "degraded" using
thresholds calibrated on this host (quiet ~8-15 ms alloc, ~70 ms
loop; the memory-collapse mode shows alloc >20× quiet with loop
near-normal).
"""

from __future__ import annotations

import json
import time


def probe() -> dict:
    import numpy as np
    # FIRST-touch timing, one shot: the observed collapse mode is in
    # fresh page faults (mmap + zeroing); repeated same-size allocs
    # reuse freed pages and hide it completely (measured: 4.5 s first
    # touch vs 22 ms on the best-of-3 of the same expression).
    t0 = time.perf_counter()
    a = np.empty(8_000_000)          # 64 MB of fresh pages
    a.fill(1.0)
    float(a.sum())
    alloc = time.perf_counter() - t0
    del a
    best_loop = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = 0
        for i in range(1_000_000):
            x += i
        best_loop = min(best_loop, time.perf_counter() - t0)
    out = {"alloc_ms": round(alloc * 1e3, 2),
           "loop_ms": round(best_loop * 1e3, 2),
           "unix": int(time.time())}
    out["health"] = classify(out)
    return out


def classify(p: dict) -> str:
    if p["alloc_ms"] > 200 or p["loop_ms"] > 400:
        return "degraded"
    if p["alloc_ms"] > 50 or p["loop_ms"] > 150:
        return "busy"
    return "quiet"


if __name__ == "__main__":
    print(json.dumps(probe()))

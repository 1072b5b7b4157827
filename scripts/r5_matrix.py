"""Round-5 scaling experiment matrix: variants × {2,8} cores,
interleaved rounds (noise protocol), taskset-pinned.  Appends one
JSON line per run to the log; final summary = best-of-rounds per
(variant, cpus) with eff(2→8).

    nohup python scripts/r5_matrix.py <out.jsonl> <variant> [...] &
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1]
VARIANTS = sys.argv[2:] or ["base"]
ROUNDS = int(os.environ.get("R5_ROUNDS", "2"))
LEVELS = [int(x) for x in os.environ.get("R5_LEVELS", "2,8").split(",")]
REP = os.environ.get("R5_REP", "128")


def run(cpus: int, variant: str) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "scripts", "scale_exp.py"),
           str(cpus), variant, REP]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        return {"cpus": cpus, "variant": variant, "error":
                out.stderr[-2000:]}
    d = json.loads(line[-1])
    d["wall"] = round(time.time() - t0, 1)
    return d


def main() -> None:
    best = {}
    with open(OUT, "a") as f:
        for rnd in range(ROUNDS):
            for variant in VARIANTS:
                for cpus in LEVELS:
                    d = run(cpus, variant)
                    d["round"] = rnd
                    f.write(json.dumps(d) + "\n")
                    f.flush()
                    k = (variant, cpus)
                    if "docs_per_sec" in d and (
                            k not in best
                            or d["docs_per_sec"] > best[k]["docs_per_sec"]):
                        best[k] = d
        summary = []
        for variant in VARIANTS:
            lo, hi = LEVELS[0], LEVELS[-1]
            if (variant, lo) in best and (variant, hi) in best:
                eff = (best[(variant, hi)]["docs_per_sec"]
                       / best[(variant, lo)]["docs_per_sec"]) / (hi / lo)
                summary.append({
                    "variant": variant,
                    f"dps_{lo}": best[(variant, lo)]["docs_per_sec"],
                    f"dps_{hi}": best[(variant, hi)]["docs_per_sec"],
                    "eff": round(eff, 3)})
        f.write(json.dumps({"summary": summary}) + "\n")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

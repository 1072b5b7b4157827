"""Re-assemble BENCH/BASELINE.md from its generated headline plus the
persistent BENCH/APPENDIX*.md files, WITHOUT re-running any bench.

scripts/scaling.py writes the headline (scaling table + raw JSON,
ending at its "Generated in Ns." stamp) and appends every appendix at
generation time.  When an appendix is edited afterwards, run this to
refresh the assembled copy:

    python scripts/assemble_baseline.py
"""

from __future__ import annotations

import os
import re

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH")


def main() -> None:
    path = os.path.join(BENCH, "BASELINE.md")
    text = open(path).read()
    m = re.search(r"^Generated in \d+s\.$", text, re.M)
    if not m:
        raise SystemExit("no 'Generated in Ns.' stamp in BASELINE.md")
    head = text[:m.end()]
    parts = [head]
    for apx in sorted(os.listdir(BENCH)):
        if apx.startswith("APPENDIX") and apx.endswith(".md"):
            with open(os.path.join(BENCH, apx)) as f:
                parts.append("\n\n" + f.read().rstrip())
    with open(path, "w") as f:
        f.write("".join(parts) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

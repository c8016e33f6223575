"""Static SURVEY.md §2 coverage report: for every operator id in the
inventory, find where the repo implements/exercises it. An id counts as
covered only when it is cited from SOURCE (package modules, entry,
bench, tests) — README/markdown mentions are excluded so a doc-only
citation can't masquerade as an implementation. Prints MISSING ids and,
with -v, the files citing each id.

Usage: python tools/survey_coverage.py [-v]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

IDS = (
    [f"S{i}" for i in range(1, 13)]
    + [f"P{i}" for i in range(1, 23)]
    + [f"J{i}" for i in range(1, 8)]
    + [f"A{i}" for i in range(1, 12)]
    + [f"W{i}" for i in range(1, 6)]
    + [f"O{i}" for i in range(1, 6)]
    + [f"U{i}" for i in range(1, 4)]
    + [f"F{i}" for i in range(1, 10)]
    + [f"T{i}" for i in range(1, 9)]
    + [f"D{i}" for i in range(1, 5)]
)


def main() -> int:
    verbose = "-v" in sys.argv
    files = (
        list((REPO / "webscrape_neko_jirushi_spark").rglob("*.py"))
        + [REPO / "__spark_entry__.py", REPO / "bench.py"]
        + list((REPO / "tests").glob("*.py"))
    )
    texts = {p: p.read_text() for p in files}

    missing = []
    for op_id in IDS:
        # word-boundary id mention (e.g. "W1", "P13-P20", "A2/A9")
        hits = [
            p.relative_to(REPO)
            for p, t in texts.items()
            if re.search(rf"\b{op_id}\b", t)
        ]
        if not hits:
            missing.append(op_id)
        elif verbose:
            print(f"{op_id}: {', '.join(map(str, hits))}")
    print(f"{len(IDS) - len(missing)}/{len(IDS)} SURVEY §2 ids cited from source")
    if missing:
        print("MISSING:", missing)
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Static SURVEY.md §2 coverage report: for every operator id in the
inventory, find where the repo implements/exercises it (module docstring
mentions + README coverage map + queries()). Prints MISSING ids.

Usage: python tools/survey_coverage.py
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
    corpus = ""
    for p in list((REPO / "webscrape_neko_jirushi_spark").rglob("*.py")) + [
        REPO / "__spark_entry__.py",
        REPO / "README.md",
        REPO / "bench.py",
    ] + list((REPO / "tests").glob("*.py")):
        corpus += p.read_text()

    missing = []
    for op_id in IDS:
        # word-boundary id mention (e.g. "W1", "P13-P20", "A2/A9")
        if not re.search(rf"\b{op_id}\b", corpus):
            missing.append(op_id)
    print(f"{len(IDS) - len(missing)}/{len(IDS)} SURVEY §2 ids referenced in code/docs")
    if missing:
        print("MISSING:", missing)
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())

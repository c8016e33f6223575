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


def _x_rows() -> list[tuple[str, list[str]]]:
    """X-family rows are open-ended (the LLM-pipeline family grows
    round over round) — read them from SURVEY.md §2. An X id counts
    as covered when every file its WHERE column cites exists (the
    X rows were verified by driver queries historically, so literal
    id citations in source are not required the way core ids are)."""
    survey = (REPO / "SURVEY.md").read_text()
    rows = []
    for m in re.finditer(r"^\| (X\d+) \|.*\| ([^|]+) \|\s*$", survey, flags=re.M):
        files = [
            f.split("::")[0].strip()
            for f in re.findall(r"`([^`]+)`", m.group(2))
            # prose fragments like `_wide` or `dedup.embedding_near_dups`
            # are function references, not file citations
            if "/" in f
        ]
        rows.append((m.group(1), files))
    return sorted(rows, key=lambda r: int(r[0][1:]))


def main() -> int:
    verbose = "-v" in sys.argv
    files = (
        list((REPO / "webscrape_neko_jirushi_spark").rglob("*.py"))
        + [REPO / "__spark_entry__.py", REPO / "bench.py"]
        + list((REPO / "tests").glob("*.py"))
    )
    texts = {p: p.read_text() for p in files}

    missing = []
    x_rows = _x_rows()
    pkg = REPO / "webscrape_neko_jirushi_spark"
    for op_id, cited in x_rows:
        bad = [
            f for f in cited
            if not ((pkg / f).exists() or (REPO / f).exists())
        ]
        if bad:
            missing.append(f"{op_id} (missing files: {bad})")
        elif verbose:
            print(f"{op_id}: {cited}")
    all_ids = IDS + [r[0] for r in x_rows]
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
    print(f"{len(all_ids) - len(missing)}/{len(all_ids)} SURVEY §2 ids cited from source")
    if missing:
        print("MISSING:", missing)
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())

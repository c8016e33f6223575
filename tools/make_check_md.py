#!/usr/bin/env python3
"""Round-close full-surface oracle gate artifact (VERDICT r5 #2): run
``tools/check_oracle.py`` over ALL registered queries at sf0.01, plus
the heavy near-dup/text set at sf0.1, and write the per-query
name/rows/hash table to ``BENCH/CHECK.md``. The driver's correctness
pass samples 50 queries per round; this commits the full 151-query
record so every query has a driver-style signal every round.

Usage: python tools/make_check_md.py [out_md]
"""

from __future__ import annotations

import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

HEAVY_SF01 = [
    "minhash_signatures", "lsh_candidate_pairs", "ngram_jaccard_pairs",
    "simhash_near_dups", "embedding_near_dup_pairs", "near_dup_clusters",
    "containment_pairs", "exact_substring_removal", "substr_dup_ratio",
    "lm_perplexity", "ccnet_quality_buckets", "repetition_stats",
    "gopher_admission", "canonical_selection", "canonical_kept_corpus",
    "interleaved_near_dups", "winnow_overlap_pairs", "source_overlap_exact",
    "source_overlap_sketch", "curation_pipeline_e2e", "training_export_e2e",
    "semantic_decontamination", "benchmark_contamination",
]


def run_gate(sf_dir: str, names: list[str]) -> list[str]:
    cmd = [sys.executable, str(REPO / "tools/check_oracle.py"), sf_dir] + names
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO
    )
    lines = [
        ln for ln in out.stdout.splitlines()
        if ln.startswith(("OK", "FAIL", "ERR"))
    ]
    if out.returncode != 0 and not lines:
        raise SystemExit(f"gate failed: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return lines


def to_rows(lines: list[str]) -> tuple[list[str], int, int]:
    rows, ok = [], 0
    for ln in lines:
        status, rest = ln.split(None, 1)
        name = rest.split(":")[0]
        detail = rest.split(":", 1)[1].strip()
        ok += status == "OK"
        rows.append(f"| {name} | {status} | {detail} |")
    return rows, ok, len(lines)


def main() -> None:
    out_md = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "BENCH/CHECK.md"
    t0 = time.time()
    full = run_gate("/root/testdata/sf0.01", [])
    heavy = run_gate("/root/testdata/sf0.1", HEAVY_SF01)
    r1, ok1, n1 = to_rows(full)
    r2, ok2, n2 = to_rows(heavy)
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    out_md.write_text(
        f"# BENCH/CHECK.md — full-surface oracle gate ({stamp})\n\n"
        "Regenerated each round (`python tools/make_check_md.py`): every\n"
        "registered query run on Spark and on its DuckDB oracle twin over\n"
        "the same sf dir, compared on row count, column names, and an\n"
        "order-insensitive value hash (`tools/check_oracle.py`, the same\n"
        "canonicalizer as the driver's gate).\n\n"
        f"## All queries at sf0.01 — **{ok1}/{n1} OK**\n\n"
        "| query | status | detail |\n|---|---|---|\n"
        + "\n".join(r1)
        + f"\n\n## Heavy set at sf0.1 — **{ok2}/{n2} OK**\n\n"
        "| query | status | detail |\n|---|---|---|\n"
        + "\n".join(r2)
        + f"\n\nTotal wall: {time.time() - t0:.0f} s\n"
    )
    print(f"wrote {out_md}: sf0.01 {ok1}/{n1}, sf0.1 heavy {ok2}/{n2}")
    if ok1 != n1 or ok2 != n2:
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Controlled A/B for repetition_stats' two-scan shape (round-5
self-identified worklist #2).

The default plan scans ``documents`` twice — once for the per-doc base
metrics, once for the gram-span explode — and equi-joins at the end.
The ``single_scan=True`` variant carries the three base metrics
through the explode (``explode_outer`` keeps gram-less docs) and
recovers them with ``first()`` in the aggregates: ONE scan, ~2x the
shuffle payload per gram row. Variants are output-identical
(tests/test_repetition.py); this measures which side of the
scan-vs-shuffle trade wins, warm and alternating in one session, at
the sf0.1-like shape and the 100x synth corpus — the same protocol as
ab_bucket_pairs.py.

Usage:  SPARK_GRAFT_CPUS=32 python BENCH/ab_repetition.py
Env:    AB_REPS (default 3), DEDUP_SCALE_DIR (corpus cache, shared
        with run_dedup_scale.py)
Prints one JSON line; the decision lives in the repetition_stats
docstring.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from webscrape_neko_jirushi_spark.session import get_spark  # noqa: E402
from webscrape_neko_jirushi_spark.sources.synth_corpus import (  # noqa: E402
    synth_documents,
)
from webscrape_neko_jirushi_spark.text import repetition  # noqa: E402


def _corpus(spark, root: Path, n_docs: int) -> str:
    p = root / f"docs_{n_docs}"
    if not (p / "_SUCCESS").exists():
        synth_documents(
            spark, n_docs, partitions=max(8, n_docs // 25_000)
        ).drop("base_id").write.mode("overwrite").parquet(str(p))
    return str(p)


def _run(spark, docs_path: str, single_scan: bool) -> tuple[float, tuple]:
    docs = spark.read.parquet(docs_path)
    t0 = time.monotonic()
    # terminal agg forces the winners AND the base metrics; sums are
    # order-free so both variants must agree cell-for-cell
    row = (
        repetition.repetition_stats(docs, (2, 3), single_scan=single_scan)
        .agg(
            F.count("*").alias("n"),
            F.sum("n_words").alias("w"),
            F.round(F.avg("dup_word_frac"), 6).alias("dw"),
            F.round(F.avg("top2gram_frac"), 6).alias("t2"),
            F.round(F.avg("top3gram_frac"), 6).alias("t3"),
        )
        .first()
    )
    return time.monotonic() - t0, tuple(row)


def main() -> None:
    reps = int(os.environ.get("AB_REPS", "3"))
    root = Path(os.environ.get("DEDUP_SCALE_DIR", "/tmp/dedup_scale"))
    root.mkdir(parents=True, exist_ok=True)
    spark = get_spark("ab-repetition", shuffle_partitions=64)

    sizes = {"sf0.1-shape": 7_500, "100x": 600_000}
    paths = {k: _corpus(spark, root, n) for k, n in sizes.items()}

    for s in (False, True):  # warmup at the small shape
        _run(spark, paths["sf0.1-shape"], s)

    out: dict[str, dict] = {}
    for label, path in paths.items():
        res = {"two-scan": [], "single-scan": []}
        sums = set()
        for _ in range(reps):
            for name, s in (("two-scan", False), ("single-scan", True)):
                dt, row = _run(spark, path, s)
                res[name].append(round(dt, 3))
                sums.add(row)
                print(f"[{label}] {name}: {dt:.2f}s", file=sys.stderr)
        assert len(sums) == 1, f"variants disagree: {sums}"
        out[label] = {
            name: {"runs": ts, "median": round(statistics.median(ts), 3)}
            for name, ts in res.items()
        }

    print(json.dumps({"metric": "repetition_stats_ab", "reps": reps, "results": out}))


if __name__ == "__main__":
    main()

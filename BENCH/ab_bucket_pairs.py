#!/usr/bin/env python3
"""Controlled A/B for bucket_pairs' double-compute (VERDICT r4 #2).

The r4 measurement changed two variables at once: localCheckpoint of
the banded table both eliminated the duplicated upstream AND swapped
the broadcast join for a sort-merge join over the statistics-less RDD
scan. This A/B isolates the variable that matters by testing THREE
forms of the minhash -> banding -> band-self-join pipeline:

  lazy       — status quo: one DAG, upstream executes once per join
               side, Catalyst auto-broadcasts the small side
  mat+hint   — localCheckpoint + explicit F.broadcast() on the build
               side: upstream executes ONCE, join strategy unchanged
               (bucket_pairs(materialize=True))

Both run WARM, alternating, in one session, at two corpus shapes:
the sf0.1-like dense corpus (7,500 docs) and the 100x synth corpus
(600,000 docs) — per the A/B protocol that caught the r4 conflation.

Usage:  SPARK_GRAFT_CPUS=32 python BENCH/ab_bucket_pairs.py
Env:    AB_REPS (default 3), DEDUP_SCALE_DIR (corpus cache, shared
        with run_dedup_scale.py)
Prints one JSON line; paste the table into the bucket_pairs docstring
note / BENCH/DEDUP_SCALE.md when the decision changes.
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

from webscrape_neko_jirushi_spark.operators import dedup  # noqa: E402
from webscrape_neko_jirushi_spark.session import get_spark  # noqa: E402
from webscrape_neko_jirushi_spark.sources.synth_corpus import (  # noqa: E402
    synth_documents,
)


def _corpus(spark, root: Path, n_docs: int) -> str:
    p = root / f"docs_{n_docs}"
    if not (p / "_SUCCESS").exists():
        synth_documents(
            spark, n_docs, partitions=max(8, n_docs // 25_000)
        ).drop("base_id").write.mode("overwrite").parquet(str(p))
    return str(p)


def _run(spark, docs_path: str, materialize: bool) -> tuple[float, int]:
    docs = spark.read.parquet(docs_path)
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)
    t0 = time.monotonic()
    rows = dedup.lsh_candidate_pairs(
        sigs, "doc_id", 16, 4, materialize=materialize
    ).count()
    return time.monotonic() - t0, rows


def main() -> None:
    reps = int(os.environ.get("AB_REPS", "3"))
    root = Path(os.environ.get("DEDUP_SCALE_DIR", "/tmp/dedup_scale"))
    root.mkdir(parents=True, exist_ok=True)
    spark = get_spark("ab-bucket-pairs", shuffle_partitions=64)

    sizes = {"sf0.1-shape": 7_500, "100x": 600_000}
    paths = {k: _corpus(spark, root, n) for k, n in sizes.items()}

    # warmup: one run of each variant at the small shape
    for m in (False, True):
        _run(spark, paths["sf0.1-shape"], m)

    out: dict[str, dict[str, dict]] = {}
    for label, path in paths.items():
        res = {"lazy": [], "mat+hint": []}
        rows_seen = set()
        for _ in range(reps):
            for name, m in (("lazy", False), ("mat+hint", True)):
                dt, rows = _run(spark, path, m)
                res[name].append(round(dt, 3))
                rows_seen.add(rows)
                print(f"[{label}] {name}: {dt:.2f}s ({rows} rows)", file=sys.stderr)
        assert len(rows_seen) == 1, f"variants disagree on rows: {rows_seen}"
        out[label] = {
            name: {
                "runs": ts,
                "median": round(statistics.median(ts), 3),
            }
            for name, ts in res.items()
        }
        out[label]["rows"] = rows_seen.pop()

    print(json.dumps({"metric": "bucket_pairs_ab", "reps": reps, "results": out}))


if __name__ == "__main__":
    main()

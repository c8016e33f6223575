#!/usr/bin/env python3
"""Round-6 per-query isolation bench (guide §1.4): times any subset of
declared queries with the noop sink under the SAME session settings as
the frozen ``bench.py`` (local[$SPARK_GRAFT_CPUS], 64 shuffle
partitions, /dev/shm local dir), without the crawl stage, so a single
query can be A/B'd in seconds.  ``bench.py`` itself stays the driver
contract; numbers cited in OPTIMIZATION_r06.md name which harness
produced them.

Usage:
    python bench_extra.py q1 q2 ...          # median-of-N (default 3)
    BENCH_REPS=5 python bench_extra.py q1
    BENCH_EXPLAIN=plans/r06 python bench_extra.py q1   # also dump
        .explain("formatted") to <dir>/<q>.txt (no timing needed)
    python bench_extra.py --headline         # the 15 headline queries

Prints one JSON line: {"queries": {name: [rep_secs...]}, "median": {...},
"min": {...}, "loadavg": [...]}.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entry  # noqa: E402
from webscrape_neko_jirushi_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "advanced_cascade_stats",
    "aggressive_cascade_stats",
    "keep_first_dedup",
    "ordinal_rename",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "cosine_topk",
    "embedding_near_dup_pairs",
    "ann_topk_lsh",
    "asof_click_view",
    "sessionize_events",
    "hourly_event_rollup",
]


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    del df
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    explain_dir = os.environ.get("BENCH_EXPLAIN")

    names = sys.argv[1:]
    if "--headline" in names:
        names = HEADLINE + [n for n in names if n != "--headline"]
    if not names:
        print("usage: bench_extra.py [--headline] [query ...]", file=sys.stderr)
        sys.exit(2)

    extra = {}
    local_dir = None
    if os.path.isdir("/dev/shm"):
        local_dir = tempfile.mkdtemp(prefix="spark_local_", dir="/dev/shm")
        extra["spark.local.dir"] = local_dir
    spark = get_spark("bench_extra", cores=n_cpus, shuffle_partitions=64, extra_conf=extra)

    queries = entry.queries()
    bad = [n for n in names if n not in queries]
    if bad:
        print(f"unknown queries: {bad}", file=sys.stderr)
        sys.exit(2)

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            Path(explain_dir, f"{name}.txt").write_text(txt)
            print(f"wrote {explain_dir}/{name}.txt", file=sys.stderr)
        spark.stop()
        if local_dir:
            shutil.rmtree(local_dir, ignore_errors=True)
        return

    # one untimed warmup (JIT/codegen/parquet footers), same as bench.py
    run_query(spark, queries["per_group_rollup"], sf_dir)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:rep{rep}")
            samples[name].append(round(run_query(spark, queries[name], sf_dir), 3))
            spark.sparkContext.setJobDescription(None)

    med = {n: sorted(v)[len(v) // 2] for n, v in samples.items()}
    mn = {n: min(v) for n, v in samples.items()}
    print(
        json.dumps(
            {
                "queries": samples,
                "median": med,
                "min": mn,
                "total_median": round(sum(med.values()), 3),
                "loadavg": list(os.getloadavg()),
                "sf_dir": sf_dir,
                "cpus": n_cpus,
            }
        )
    )
    spark.stop()
    if local_dir:
        shutil.rmtree(local_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

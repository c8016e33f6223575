"""crawl.assign: rendezvous (HRW) consistent assignment.

Gates: (1) minimal disruption — removing a worker reassigns ONLY its
keys (the property modulo hashing lacks, and the reason HRW preserves
per-host politeness state across fleet changes), (2) rough balance
across workers, (3) vnode weighting shifts share, (4) Spark/DuckDB
twin equality key-for-key, (5) the plan is a pure projection (no
shuffle, no Python), (6) loud guards (empty list, '|' in names,
> 512 workers), NULL keys -> NULL owner.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.crawl import assign as rz

WORKERS = [f"fetcher-{i}" for i in range(8)]


def _hosts(spark, n=400, parts=6):
    return spark.range(n).select(
        F.concat(F.lit("host"), F.col("id")).alias("host")
    ).repartition(parts)


def test_minimal_disruption_on_worker_removal(spark):
    df = _hosts(spark)
    full = {
        r.host: r.worker
        for r in rz.rendezvous_assign(df, "host", WORKERS).collect()
    }
    removed = WORKERS[3]
    reduced = {
        r.host: r.worker
        for r in rz.rendezvous_assign(
            df, "host", [w for w in WORKERS if w != removed]
        ).collect()
    }
    moved = {h for h in full if full[h] != reduced[h]}
    # exactly the removed worker's keys move, nothing else
    assert moved == {h for h, w in full.items() if w == removed}
    assert all(reduced[h] != removed for h in moved)


def test_rough_balance(spark):
    counts = (
        rz.rendezvous_assign(_hosts(spark, 4000), "host", WORKERS)
        .groupBy("worker")
        .count()
        .collect()
    )
    got = {r.worker: r["count"] for r in counts}
    assert set(got) == set(WORKERS)
    # 4000 keys / 8 workers = 500 expected; allow a generous band
    assert all(300 < c < 700 for c in got.values())


def test_vnode_weighting(spark):
    # "big" listed 3x vs 1x "small": ~3x the keyspace
    counts = {
        r.worker: r["count"]
        for r in rz.rendezvous_assign(
            _hosts(spark, 4000), "host", ["big", "big", "big", "small"]
        )
        .groupBy("worker")
        .count()
        .collect()
    }
    assert counts["big"] > 2 * counts["small"]


def test_duckdb_twin_matches(spark):
    df = _hosts(spark, 300)
    got = {
        (r.host, r.worker)
        for r in rz.rendezvous_assign(df, "host", WORKERS).collect()
    }
    con = duckdb.connect()
    col = rz.rendezvous_assign_sql("host", WORKERS)
    ref = set(
        con.execute(
            f"SELECT host, {col} FROM (SELECT 'host' || CAST(u AS VARCHAR)"
            f" AS host FROM UNNEST(range(0, 300)) AS t(u))"
        ).fetchall()
    )
    assert got == ref


def test_pure_projection_plan(spark):
    base = spark.range(100).select(
        F.concat(F.lit("host"), F.col("id")).alias("host")
    )  # no repartition: any Exchange in the plan would be assign's
    df = rz.rendezvous_assign(base, "host", WORKERS)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert bad not in plan, bad


def test_guards_and_nulls(spark):
    df = spark.createDataFrame([("a",), (None,)], "host string")
    with pytest.raises(ValueError, match="empty"):
        rz.rendezvous_assign(df, "host", [])
    with pytest.raises(ValueError, match="'\\|'"):
        rz.rendezvous_assign(df, "host", ["ok", "ba|d"])
    with pytest.raises(ValueError, match="512"):
        rz.rendezvous_assign(df, "host", [f"w{i}" for i in range(600)])
    got = {r.host: r.worker for r in rz.rendezvous_assign(df, "host", ["w"]).collect()}
    assert got["a"] == "w" and got[None] is None

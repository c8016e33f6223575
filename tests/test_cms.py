"""Count-min sketch (operators/cms.py): one-sided guarantee, exactness
at low occupancy, merge semantics, broadcast probe plan, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import cms

W, D = 1 << 10, 4


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' x 500 + 200 distinct singletons
    return spark.createDataFrame(
        [("hot",)] * 500 + [(f"k{i}",) for i in range(200)], "v string"
    )


def test_estimates_one_sided_and_tight(spark, skewed):
    sk = cms.cms_build(skewed, "v", W, D)
    keys = spark.createDataFrame(
        [("hot",), ("k0",), ("k7",), ("absent",)], "v string"
    )
    est = {r["v"]: r["estimate"] for r in cms.cms_query(sk, keys, "v", W, D).collect()}
    truth = {"hot": 500, "k0": 1, "k7": 1, "absent": 0}
    n = 700
    for k, t in truth.items():
        assert est[k] >= t, k  # never undercounts
        assert est[k] <= t + 2 * n / W * D, k  # loose sanity bound
    # at 201 distinct keys in 4096 cells, collisions are unlikely:
    assert est["hot"] == 500


def test_null_keys_excluded_both_engines(spark):
    """NULLs are not keys: Spark would hash them into a junk NULL
    bucket while DuckDB's CONCAT skips the NULL and hashes the bare
    salt into a REAL cell — sketches must be identical with or
    without NULL rows."""
    import duckdb

    base = spark.createDataFrame([("a",)] * 3 + [("b",)], "v string")
    with_nulls = base.unionByName(
        spark.createDataFrame([(None,)] * 5, "v string")
    )
    clean = {tuple(r) for r in cms.cms_build(base, "v", W, D).collect()}
    dirty = {tuple(r) for r in cms.cms_build(with_nulls, "v", W, D).collect()}
    assert clean == dirty
    con = duckdb.connect()
    con.register("t", with_nulls.toPandas())
    want = {tuple(r) for r in con.execute(cms.cms_build_sql("v", W, D)).fetchall()}
    assert dirty == want


def test_merge_equals_union(spark):
    a = spark.createDataFrame([(f"a{i % 50}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"a{i % 30}",) for i in range(200)], "v string")
    merged = cms.cms_merge(cms.cms_build(a, "v", W, D), cms.cms_build(b, "v", W, D))
    direct = cms.cms_build(a.unionByName(b), "v", W, D)
    got = {(r["row"], r["bucket"], r["cnt"]) for r in merged.collect()}
    want = {(r["row"], r["bucket"], r["cnt"]) for r in direct.collect()}
    assert got == want


def test_sketch_size_bounded(skewed):
    sk = cms.cms_build(skewed, "v", W, D)
    assert sk.count() <= W * D


def test_probe_broadcasts(spark, skewed):
    from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

    sk = cms.cms_build(skewed, "v", W, D)
    keys = spark.createDataFrame([("hot",)], "v string")
    plan = physical_plan(cms.cms_query(sk, keys, "v", W, D))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_duckdb_twin(spark, skewed):
    import duckdb
    import pandas as pd

    sk = {(r["row"], r["bucket"], r["cnt"]) for r in cms.cms_build(skewed, "v", W, D).collect()}
    rows = [("hot",)] * 500 + [(f"k{i}",) for i in range(200)]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": [r[0] for r in rows]}))
    want = {tuple(r) for r in con.execute(cms.cms_build_sql("v", W, D)).fetchall()}
    assert sk == want


def test_guards(skewed):
    with pytest.raises(ValueError, match="w >= 2"):
        cms.cms_build(skewed, "v", 1, 4)

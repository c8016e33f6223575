"""X64 salted join: result parity with the plain join, replication
accounting, plan shape, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators.skewjoin import salted_join


@pytest.fixture()
def sides(spark):
    # hot key 7 dominates the probe side; build side small but NOT broadcast-worthy in the real case
    probe = spark.createDataFrame(
        [(7, f"p{i}") for i in range(200)] + [(i % 5, f"q{i}") for i in range(50)],
        "k int, pv string",
    )
    build = spark.createDataFrame(
        [(i, f"b{i}") for i in range(10)], "k int, bv string"
    )
    return probe, build


def _bag(df):
    out = {}
    for t in (tuple(r) for r in df.collect()):
        out[t] = out.get(t, 0) + 1
    return out


def test_inner_and_left_parity(spark, sides):
    probe, build = sides
    for how in ("inner", "left"):
        plain = probe.join(build, "k", how)
        for hot in (None, [7], [7, 0], [999]):
            salted = salted_join(probe, build, "k", 8, hot_keys=hot, how=how)
            assert _bag(salted) == _bag(plain), (how, hot)


def test_nulls_and_unmatched_keys(spark):
    probe = spark.createDataFrame(
        [(None, "pn"), (1, "p1"), (42, "p42")], "k int, pv string"
    )
    build = spark.createDataFrame([(1, "b1")], "k int, bv string")
    plain = probe.join(build, "k", "left")
    salted = salted_join(probe, build, "k", 4, hot_keys=[1], how="left")
    assert _bag(salted) == _bag(plain)


def test_replication_is_targeted(spark, sides):
    probe, build = sides
    # with hot_keys=[7] only ONE build row replicates: |b| + (n-1)*1
    salts = F.when(F.col("k").isin([7]), F.sequence(F.lit(0), F.lit(7))).otherwise(
        F.array(F.lit(0))
    )
    n = build.withColumn("_salt", F.explode(salts)).count()
    assert n == 10 + 7  # 10 rows salt-0 + hot key 7's extra 7 copies


def test_join_is_on_key_and_salt(spark, sides):
    probe, build = sides
    plan = (
        salted_join(probe, build, "k", 8, hot_keys=[7])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_salt" in plan  # the salt is a real join key, not dropped early
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_validation(spark, sides):
    probe, build = sides
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(probe, build, "k", 1)
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(probe, build, "k", 4, how="full")
    with pytest.raises(ValueError, match="overlapping"):
        salted_join(probe, probe.withColumnRenamed("k", "k2"), "k2", 4)

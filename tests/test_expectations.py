"""X63 data-quality expectations: single-pass metrics, gate, drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import expectations as E


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0),
            (2, "b@y.org", 20.0),
            (3, None, 30.0),
            (4, "not-an-email", 40.0),
            (4, "d@z.net", None),
        ],
        "id int, email string, amount double",
    )


def _run(spark, df, checks):
    return {r["check"]: r for r in E.check_suite(df, checks).collect()}


def test_metrics_and_gate(spark, df):
    suite = [
        E.completeness("email", 0.9),
        E.uniqueness("id", 1.0),
        E.min_value("amount", 0.0),
        E.max_value("amount", 35.0),
        E.mean_between("amount", 20.0, 30.0),
        E.match_rate("email", r"^[^@ ]+@[^@ ]+[.][a-z]+$", 0.9),
        E.row_count_between(5, 10),
    ]
    res = _run(spark, df, suite)
    assert res["completeness(email)"]["metric"] == 0.8
    assert not res["completeness(email)"]["passed"]
    assert res["uniqueness(id)"]["metric"] == 0.8  # dup id 4
    assert res["min(amount)"]["metric"] == 10.0
    assert res["max(amount)"]["metric"] == 40.0 and not res["max(amount)"]["passed"]
    assert res["mean(amount)"]["metric"] == 25.0  # nulls excluded from mean
    assert res["match_rate(email)"]["metric"] == 0.75  # of 4 non-null, 3 match
    assert res["row_count"]["metric"] == 5.0 and res["row_count"]["passed"]
    assert E.suite_passed(E.check_suite(df, suite)) is False
    ok = [E.min_value("amount", 0.0), E.row_count_between(1)]
    assert E.suite_passed(E.check_suite(df, ok)) is True


def test_never_evaluated_checks_fail_gate(spark):
    """An all-NULL column (or empty table) leaves min/max/mean
    unevaluated — NULL passed must FAIL the publish gate, not be
    skipped by F.min, and mean must report NULL, not a fabricated
    1.0 that could spuriously clear the bounds."""
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "id int, price double"
    )
    suite = [
        E.min_value("price", 0.0),
        E.mean_between("price", 0.5, 2.0),
    ]
    res = _run(spark, nulls, suite)
    assert res["min(price)"]["metric"] is None
    assert res["mean(price)"]["metric"] is None
    assert res["mean(price)"]["passed"] is None
    assert E.suite_passed(E.check_suite(nulls, suite)) is False
    empty = nulls.filter(F.lit(False))
    assert E.suite_passed(E.check_suite(empty, suite)) is False


def test_single_aggregate_pass(spark, df):
    suite = [E.completeness("email"), E.min_value("amount", 0), E.row_count_between(1)]
    plan = E.check_suite(df, suite)._jdf.queryExecution().executedPlan().toString()
    # one aggregate over one scan: no join, no union of per-check jobs
    assert "Join" not in plan and "Union" not in plan


def test_empty_and_duplicate_validation(spark, df):
    with pytest.raises(ValueError, match="empty"):
        E.check_suite(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        E.check_suite(df, [E.row_count_between(1), E.row_count_between(2)])
    # empty table: ratios guard to 1.0, row_count fails
    empty = df.limit(0)
    res = _run(spark, empty, [E.completeness("email"), E.row_count_between(1)])
    assert res["completeness(email)"]["metric"] == 1.0
    assert not res["row_count"]["passed"]


def test_baseline_drift(spark, df):
    suite = [E.completeness("email"), E.mean_between("amount", 0, 100)]
    base = E.check_suite(df, suite)
    cur = E.check_suite(
        df.withColumn("email", F.lit(None).cast("string")), suite
    )
    out = {r["check"]: r for r in E.baseline_compare(cur, base, tol=0.05).collect()}
    assert out["completeness(email)"]["drifted"]  # 0.8 -> 1.0-guard? no: 0 rows nonnull -> 0.0
    assert out["completeness(email)"]["delta"] == pytest.approx(-0.8)
    assert not out["mean(amount)"]["drifted"]
    # suite change = drift by definition
    cur2 = E.check_suite(df, [E.completeness("email"), E.row_count_between(1)])
    out2 = {r["check"]: r for r in E.baseline_compare(cur2, base).collect()}
    assert out2["mean(amount)"]["drifted"] and out2["row_count"]["drifted"]

"""Bucketized range join (operators/temporal.py::range_join):
parity with the naive theta join, exactly-once matches, inclusive
bounds, bucket-width invariance, plan gate, and the loud guards."""

from __future__ import annotations

import pytest

from webscrape_neko_jirushi_spark.operators.temporal import range_join
from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

POINTS = [(i, (i * 37) % 1000) for i in range(200)]
# overlapping ranges: [0,99],[50,149],...,[900,999] width 100 step 50
RANGES = [(r, 50 * r, 50 * r + 99) for r in range(19)]


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(POINTS, "pid long, p long")


@pytest.fixture(scope="module")
def ranges(spark):
    return spark.createDataFrame(RANGES, "rid long, lo long, hi long")


def _ref():
    out = set()
    for pid, p in POINTS:
        for rid, lo, hi in RANGES:
            if lo <= p <= hi:
                out.add((pid, rid))
    return out


@pytest.mark.parametrize("width", [7, 64, 100, 1000])
def test_matches_naive_theta_join_any_width(points, ranges, width):
    got = [
        (r["pid"], r["rid"])
        for r in range_join(
            points, ranges, "p", bucket_width=width
        ).collect()
    ]
    assert len(got) == len(set(got))  # exactly-once, no dedup pass
    assert set(got) == _ref()


def test_inclusive_bounds(spark):
    pts = spark.createDataFrame([(1, 50), (2, 149), (3, 150)], "pid long, p long")
    rng = spark.createDataFrame([(7, 50, 149)], "rid long, lo long, hi long")
    got = {(r["pid"], r["rid"]) for r in range_join(pts, rng, "p", bucket_width=10).collect()}
    assert got == {(1, 7), (2, 7)}


def test_no_nested_loop_join(points, ranges):
    plan = physical_plan(range_join(points, ranges, "p", bucket_width=64))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_column_collision_raises(spark, points):
    rng = spark.createDataFrame([(1, 0, 9)], "p long, lo long, hi long")
    with pytest.raises(ValueError, match="collision"):
        range_join(points, rng, "p")


def test_bad_width_raises(points, ranges):
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(points, ranges, "p", bucket_width=0)


def test_too_wide_range_fails_loudly(spark, points):
    rng = spark.createDataFrame(
        [(1, 0, 10_000_000)], "rid long, lo long, hi long"
    )
    with pytest.raises(Exception, match="wider than"):
        range_join(
            points, rng, "p", bucket_width=10, max_buckets_per_range=100
        ).collect()


def test_preserves_both_sides_columns(points, ranges):
    out = range_join(points, ranges, "p", bucket_width=64)
    assert set(out.columns) == {"pid", "p", "rid", "lo", "hi"}

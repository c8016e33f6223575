"""X65 incremental aggregates: incremental == full recompute, merge
associativity/commutativity, schema stability, validation."""

from __future__ import annotations

import pytest

from webscrape_neko_jirushi_spark.operators import matview as MV

SPEC = [
    ("n", "count", None),
    ("total", "sum", "v"),
    ("lo", "min", "v"),
    ("hi", "max", "v"),
    ("mean", "avg", "v"),
]


@pytest.fixture()
def facts(spark):
    rows = [(f"g{i % 3}", float(i) if i % 7 else None) for i in range(60)]
    return spark.createDataFrame(rows, "g string, v double")


def _read(state, keys=("g",)):
    return {
        tuple(r[k] for k in keys): r.asDict()
        for r in MV.mv_read(state, list(keys), SPEC).collect()
    }


def test_incremental_equals_full(spark, facts):
    full = _read(MV.mv_state(facts, ["g"], SPEC))
    # three slices sharing groups (the interesting merge case)
    s0 = facts.filter("v < 20 OR v IS NULL")
    s1 = facts.filter("v >= 20 AND v < 40")
    s2 = facts.filter("v >= 40")
    state = MV.mv_refresh(None, s0, ["g"], SPEC)
    state = MV.mv_refresh(state, s1, ["g"], SPEC)
    state = MV.mv_refresh(state, s2, ["g"], SPEC)
    assert _read(state) == full


def test_merge_order_invariance(spark, facts):
    s0 = MV.mv_state(facts.filter("v < 30 OR v IS NULL"), ["g"], SPEC)
    s1 = MV.mv_state(facts.filter("v >= 30"), ["g"], SPEC)
    ab = MV.mv_merge(s0, s1, ["g"], SPEC)
    ba = MV.mv_merge(s1, s0, ["g"], SPEC)
    assert _read(ab) == _read(ba)
    # associativity incl. empty delta
    empty = MV.mv_state(facts.limit(0), ["g"], SPEC)
    abe = MV.mv_merge(ab, empty, ["g"], SPEC)
    assert _read(abe) == _read(ab)
    # repeated merges keep a stable state schema (decimal re-pinned)
    assert ab.schema == abe.schema


def test_new_group_in_delta(spark, facts):
    base = MV.mv_refresh(None, facts, ["g"], SPEC)
    delta = spark.createDataFrame([("brand_new", 5.0)], "g string, v double")
    merged = MV.mv_refresh(base, delta, ["g"], SPEC)
    out = _read(merged)
    assert out[("brand_new",)]["n"] == 1 and out[("brand_new",)]["mean"] == 5.0
    assert out[("g0",)] == _read(base)[("g0",)]


def test_all_null_group_avg(spark):
    facts = spark.createDataFrame(
        [("g", None), ("g", None)], "g string, v double"
    )
    out = _read(MV.mv_refresh(None, facts, ["g"], SPEC))
    assert out[("g",)]["n"] == 2 and out[("g",)]["mean"] is None
    assert out[("g",)]["total"] is None


def test_validation(spark, facts):
    with pytest.raises(ValueError, match="empty"):
        MV.mv_state(facts, ["g"], [])
    with pytest.raises(ValueError, match="duplicate"):
        MV.mv_state(facts, ["g"], [("a", "count", None), ("a", "min", "v")])
    with pytest.raises(ValueError, match="unsupported"):
        MV.mv_state(facts, ["g"], [("m", "median", "v")])
    with pytest.raises(ValueError, match="needs a column"):
        MV.mv_state(facts, ["g"], [("s", "sum", None)])

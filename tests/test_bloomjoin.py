"""X67 bloom-prefiltered join: plain-join parity, selectivity, filter
reuse, outer-join rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators.bloomjoin import (
    bloom_prefiltered_join,
    prefilter_only,
)


@pytest.fixture()
def sides(spark):
    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(2000)] + [(None, "pnull")],
        "k int, pv string",
    )
    build = spark.createDataFrame(
        [(i * 100, f"b{i}") for i in range(10)], "k int, bv string"
    )
    return probe, build


def _bag(df):
    out = {}
    for t in (tuple(r) for r in df.collect()):
        out[t] = out.get(t, 0) + 1
    return out


def test_null_keys_really_drop_from_prefilter(spark):
    """The NULL drop must test the KEY, not its hash — xxhash64(NULL)
    is a non-null constant, so a hash-side isNotNull is dead code and
    a NULL build key would usher every NULL probe row through
    prefilter_only as 'might-match'."""
    probe = spark.createDataFrame(
        [(None, "pn1"), (None, "pn2"), (7, "p7")], "k int, pv string"
    )
    build = spark.createDataFrame(
        [(None, "bn"), (7, "b7")], "k int, bv string"
    )
    joined, filt = bloom_prefiltered_join(spark, probe, build, "k")
    assert [tuple(r) for r in joined.collect()] == [(7, "p7", "b7")]
    pref = prefilter_only(spark, probe, "k", filt)
    assert [r["pv"] for r in pref.collect()] == ["p7"]


def test_inner_and_semi_parity(spark, sides):
    probe, build = sides
    for how in ("inner", "left_semi"):
        plain = probe.join(build, "k", how)
        joined, _ = bloom_prefiltered_join(spark, probe, build, "k", how=how)
        assert _bag(joined) == _bag(plain), how


def test_prefilter_is_selective_and_complete(spark, sides):
    probe, build = sides
    joined, filt = bloom_prefiltered_join(spark, probe, build, "k")
    kept = prefilter_only(spark, probe, "k", filt)
    n_kept = kept.count()
    # every true match survives...
    true_keys = {r["k"] for r in build.collect()}
    kept_keys = {r["k"] for r in kept.collect()}
    assert true_keys & {r["k"] for r in probe.collect()} <= kept_keys
    # ...and the shuffle input shrank by ~the non-match majority
    # (10 true matches of 2000; 1% FPR leaves generous slack)
    assert n_kept < 200


def test_filter_reuse_across_joins(spark, sides):
    probe, build = sides
    _, filt = bloom_prefiltered_join(spark, probe, build, "k")
    probe2 = spark.createDataFrame(
        [(i * 50, f"q{i}") for i in range(40)], "k int, qv string"
    )
    pref2 = prefilter_only(spark, probe2, "k", filt)
    plain = probe2.join(build, "k", "inner")
    assert _bag(pref2.join(build, "k", "inner")) == _bag(plain)


def test_outer_rejected(spark, sides):
    probe, build = sides
    with pytest.raises(ValueError, match="outer"):
        bloom_prefiltered_join(spark, probe, build, "k", how="left")

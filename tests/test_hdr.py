"""HDR-histogram quantile sketch (operators/hdr.py): one-sided
estimates with the 2^-sub_bits relative bound, the exact small-range
branch, merge exactness, bounded size, DuckDB twin parity, guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import hdr

QS = [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
SUB = 8


def _vals():
    rng = np.random.default_rng(41)
    return np.concatenate(
        [
            rng.integers(0, 200, 600),          # exact branch
            (rng.pareto(1.5, 1800) * 1000).astype("int64"),  # heavy tail
        ]
    )


@pytest.fixture(scope="module")
def metric(spark):
    return spark.createDataFrame(
        [(int(v),) for v in _vals()], "v long"
    ).cache()


def test_one_sided_with_relative_bound(spark, metric):
    sk = hdr.hdr_build(metric, "v", sub_bits=SUB)
    est = {r["q"]: r["estimate"] for r in hdr.hdr_quantiles(sk, QS).collect()}
    sv = np.sort(_vals())
    for q in QS:
        true = int(sv[int(np.floor(q * (len(sv) - 1)))])
        assert est[q] <= true
        assert true < est[q] * (1 + 2 ** -SUB) or est[q] == true


def test_exact_branch_is_exact(spark):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << SUB, 1000)
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    est = {
        r["q"]: r["estimate"]
        for r in hdr.hdr_quantiles(
            hdr.hdr_build(df, "v", sub_bits=SUB), QS
        ).collect()
    }
    sv = np.sort(vals)
    for q in QS:
        assert est[q] == int(sv[int(np.floor(q * (len(sv) - 1)))])


def test_merge_is_exact_and_order_independent(spark, metric):
    full = {
        (r["lo"], r["hi"]): r["cnt"]
        for r in hdr.hdr_build(metric, "v", sub_bits=SUB).collect()
    }
    shards = [
        hdr.hdr_build(metric.filter(F.col("v") % 3 == i), "v", sub_bits=SUB)
        for i in range(3)
    ]
    m1 = {
        (r["lo"], r["hi"]): r["cnt"]
        for r in hdr.hdr_merge(*shards).collect()
    }
    m2 = {
        (r["lo"], r["hi"]): r["cnt"]
        for r in hdr.hdr_merge(shards[2], shards[0], shards[1]).collect()
    }
    assert m1 == full and m2 == full


def test_size_bound_and_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    vals = (rng.pareto(1.1, 20000) * 50000).astype("int64")
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    sk = hdr.hdr_build(df, "v", sub_bits=SUB).collect()
    assert len(sk) <= (1 << SUB) * 63
    assert len(sk) < len(set(vals))  # genuinely compressive here
    sk7 = hdr.hdr_build(df.repartition(7), "v", sub_bits=SUB).collect()
    assert {tuple(r) for r in sk7} == {tuple(r) for r in sk}


def test_duckdb_twin_parity(spark, metric):
    vals = [int(v) for v in _vals()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT UNNEST(?) AS v", [vals])
    dsk = {
        (lo, hi): cnt
        for lo, hi, cnt in con.execute(hdr.hdr_build_sql("v", SUB)).fetchall()
    }
    ssk = {
        (r["lo"], r["hi"]): r["cnt"]
        for r in hdr.hdr_build(metric, "v", sub_bits=SUB).collect()
    }
    assert dsk == ssk
    dq = dict(
        con.execute(
            hdr.hdr_quantiles_sql(hdr.hdr_build_sql("v", SUB), QS)
        ).fetchall()
    )
    sq = {
        r["q"]: r["estimate"]
        for r in hdr.hdr_quantiles(
            hdr.hdr_build(metric, "v", sub_bits=SUB), QS
        ).collect()
    }
    assert dq == sq


def test_constant_and_empty_inputs(spark):
    const = spark.createDataFrame([(300,)] * 50, "v long")
    est = {
        r["q"]: r["estimate"]
        for r in hdr.hdr_quantiles(
            hdr.hdr_build(const, "v", sub_bits=SUB), [0.0, 0.5, 1.0]
        ).collect()
    }
    # 300 >= 2^8: collapses to its bucket lower bound, same for every q
    assert len(set(est.values())) == 1 and est[0.5] <= 300
    empty = spark.createDataFrame([], "v long")
    assert hdr.hdr_quantiles(
        hdr.hdr_build(empty, "v", sub_bits=SUB), [0.5]
    ).count() == 0


def test_guards(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="sub_bits"):
        hdr.hdr_build(df, "v", sub_bits=0)
    with pytest.raises(ValueError, match="non-empty"):
        hdr.hdr_quantiles(hdr.hdr_build(df, "v"), [])
    with pytest.raises(ValueError, match="outside"):
        hdr.hdr_quantiles(hdr.hdr_build(df, "v"), [1.5])
    for bad in (-1, 1 << 62):
        with pytest.raises(Exception, match="hdr_build"):
            hdr.hdr_build(
                spark.createDataFrame([(bad,)], "v long"), "v"
            ).collect()

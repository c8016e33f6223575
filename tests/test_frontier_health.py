"""X89 frontier health: starvation arithmetic, exact Gini law,
tie invariance, empty frontier, and the DuckDB twins."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from webscrape_neko_jirushi_spark.crawl import health


def _frontier(spark, rows):
    return spark.createDataFrame(rows, "host string, ts timestamp")


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


_ROWS = (
    [("a", _t(i)) for i in range(10)]  # depth 10, oldest at t=0
    + [("b", _t(30 + i)) for i in range(25)]  # depth 25
    + [("c", _t(59))]  # depth 1, the frontier max ts
    + [(None, _t(5))]  # NULL host: excluded
)


def test_health_rows(spark):
    got = {
        r.host: r
        for r in health.frontier_health(
            _frontier(spark, _ROWS), budget=10, starve_epochs=2
        ).collect()
    }
    assert set(got) == {"a", "b", "c"}
    assert got["a"].depth == 10 and got["a"].drain_epochs == 1
    assert got["b"].depth == 25 and got["b"].drain_epochs == 3
    assert got["c"].drain_epochs == 1
    # ages vs the frontier's own max (t=59)
    assert got["a"].oldest_age_sec == 59
    assert got["b"].oldest_age_sec == 29
    assert got["c"].oldest_age_sec == 0
    assert got["b"].starved and not got["a"].starved


def test_gini_exact_law(spark):
    # depths 10, 25, 1 -> sorted 1, 10, 25; s = 1*1 + 2*10 + 3*25 = 96
    # num = 2*96 - 4*36 = 48; den = 3*36 = 108; gini = 0.444444
    row = health.frontier_fairness(_frontier(spark, _ROWS)).collect()[0]
    assert row.n_hosts == 3 and row.total_queued == 36
    assert row.max_depth == 25
    assert int(row.gini_num) == 48 and int(row.gini_den) == 108
    assert row.gini == pytest.approx(48 / 108, abs=1e-6)


def test_gini_uniform_is_near_zero_and_ties_invariant(spark):
    rows = [(f"h{i}", _t(i % 60)) for i in range(40)] * 3  # all depth 3
    row = health.frontier_fairness(_frontier(spark, rows)).collect()[0]
    # equal depths: gini = (2*Σi*x - (n+1)*nx) / (n*nx) = 0 exactly,
    # whatever order the tied ranks landed in
    assert int(row.gini_num) == 0
    assert row.gini == 0.0


def test_empty_frontier(spark):
    row = health.frontier_fairness(_frontier(spark, [])).collect()[0]
    assert row.n_hosts == 0 and row.total_queued == 0
    assert row.gini is None
    assert health.frontier_health(_frontier(spark, [])).count() == 0


def test_budget_guard(spark):
    with pytest.raises(ValueError):
        health.frontier_health(_frontier(spark, _ROWS), budget=0)


def test_duckdb_twins(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE f(host VARCHAR, ts TIMESTAMP)")
    con.executemany("INSERT INTO f VALUES (?, ?)", _ROWS)
    want_h = sorted(
        map(
            tuple,
            con.execute(
                health.frontier_health_sql("f", budget=10, starve_epochs=2)
            ).fetchall(),
        )
    )
    got_h = sorted(
        tuple(r)
        for r in health.frontier_health(
            _frontier(spark, _ROWS), budget=10, starve_epochs=2
        ).collect()
    )
    assert got_h == want_h
    want_f = con.execute(health.frontier_fairness_sql("f")).fetchall()[0]
    got_f = tuple(
        health.frontier_fairness(_frontier(spark, _ROWS)).collect()[0]
    )
    assert got_f == tuple(want_f)

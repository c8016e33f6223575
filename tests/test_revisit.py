"""Recrawl scheduling (crawl/revisit.py): hand-computed change rates,
revisit priorities, exact largest-remainder budget allocation, and the
DuckDB twins."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.crawl import revisit


def _ts(s):
    return datetime.fromisoformat(s)


# (url, seq, ts, fingerprint): A flips twice in 4 steps, B is a single
# fetch (unknown rate), C never changes
LOG = [
    (1, 0, _ts("2024-01-01T00:00:00"), 10.0),
    (1, 1, _ts("2024-01-02T00:00:00"), 10.0),
    (1, 2, _ts("2024-01-03T00:00:00"), 20.0),
    (1, 3, _ts("2024-01-04T00:00:00"), 20.0),
    (1, 4, _ts("2024-01-05T00:00:00"), 30.0),
    (2, 5, _ts("2024-01-03T12:00:00"), 7.0),
    (3, 6, _ts("2024-01-01T00:00:00"), 5.0),
    (3, 7, _ts("2024-01-06T00:00:00"), 5.0),
]
HORIZON = _ts("2024-01-10T00:00:00").timestamp()


@pytest.fixture(scope="module")
def log(spark):
    df = spark.createDataFrame(
        LOG, "url long, seq long, ts timestamp, fingerprint double"
    ).cache()
    yield df
    df.unpersist()


def test_change_stats_hand_computed(spark, log):
    out = {
        r["url"]: r.asDict()
        for r in revisit.change_stats(
            log, id_col="url", seq_col="seq"
        ).collect()
    }
    assert out[1]["n_fetches"] == 5 and out[1]["n_changes"] == 2
    assert out[1]["change_rate"] == 0.5
    assert out[2]["n_fetches"] == 1 and out[2]["change_rate"] is None
    assert out[3]["n_changes"] == 0 and out[3]["change_rate"] == 0.0


def test_priority_staleness_and_prior(spark, log):
    stats = revisit.change_stats(log, id_col="url", seq_col="seq")
    out = {
        r["url"]: r["priority"]
        for r in revisit.revisit_priority(stats, HORIZON).collect()
    }
    # A: last fetch Jan 5, 5 days stale, rate .5 -> 120h * .5 = 60
    assert out[1] == pytest.approx(60.0, abs=1e-9)
    # B: unknown rate takes the 0.5 prior over 6.5 days
    assert out[2] == pytest.approx(6.5 * 24 * 0.5, abs=1e-9)
    # C: never changes -> priority 0 however stale
    assert out[3] == 0.0


def test_allocate_exact_and_remainders(spark):
    pages = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 2)], "url long, weight long"
    )
    out = {r["url"]: r["alloc"] for r in
           revisit.allocate_budget(pages, 10).collect()}
    assert out == {1: 5, 2: 3, 3: 2}  # exact shares, no remainders

    tie = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "url long, weight long"
    )
    out = {r["url"]: r["alloc"] for r in
           revisit.allocate_budget(tie, 10).collect()}
    # 10/3: base 3 each, one seat left -> lowest id wins the frac tie
    assert out == {1: 4, 2: 3, 3: 3}


def test_allocate_sums_and_zero_weights(spark):
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(0, 50)) for i in range(40)]
    rows[5] = (5, 0)
    pages = spark.createDataFrame(rows, "url long, weight long")
    for budget in (0, 7, 99, 1234):
        out = revisit.allocate_budget(pages.repartition(7), budget).collect()
        assert sum(r["alloc"] for r in out) == budget
        assert all(r["alloc"] == 0 for r in out if r["weight"] == 0)
    with pytest.raises(ValueError, match="budget"):
        revisit.allocate_budget(pages, -1)
    # ALL-zero weights: double division yields IEEE NaN (no ANSI
    # error), which would silently hand the first `budget` hosts one
    # fetch each — the explicit in-plan guard must raise instead
    zeros = spark.createDataFrame(
        [(i, 0) for i in range(5)], "url long, weight long"
    )
    with pytest.raises(Exception, match="positive weight"):
        revisit.allocate_budget(zeros, 3).collect()


def test_duckdb_twins(spark, log):
    con = duckdb.connect()
    con.register(
        "fetch_log",
        pd.DataFrame(LOG, columns=["url", "seq", "ts", "fingerprint"]),
    )
    ctes = revisit.change_stats_sql_ctes(
        "SELECT url, seq, ts, fingerprint FROM fetch_log", HORIZON
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(
            f"""WITH {ctes}
            SELECT url, n_fetches, n_changes, ROUND(change_rate, 6),
                   ROUND(priority, 6) FROM revisit"""
        ).fetchall()
    }
    stats = revisit.change_stats(log, id_col="url", seq_col="seq")
    got = {
        r["url"]: (r["n_fetches"], r["n_changes"], r["cr"], r["pr"])
        for r in revisit.revisit_priority(stats, HORIZON)
        .select(
            "url", "n_fetches", "n_changes",
            F.round("change_rate", 6).alias("cr"),
            F.round("priority", 6).alias("pr"),
        )
        .collect()
    }
    assert got == want

    # DuckDB accepts WITH inside a parenthesized subquery, so the
    # stats CTE block composes straight into the allocator twin
    alloc_sql = revisit.allocate_budget_sql(
        f"WITH {ctes} SELECT url, n_fetches FROM rv_stats",
        budget=7,
        weight_col="n_fetches",
    )
    want_a = dict(
        con.execute(f"SELECT url, alloc FROM ({alloc_sql})").fetchall()
    )
    got_a = {
        r["url"]: r["alloc"]
        for r in revisit.allocate_budget(
            stats.select("url", F.col("n_fetches").alias("weight")), 7
        ).collect()
    }
    assert got_a == want_a

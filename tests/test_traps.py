"""Crawl-trap detection (crawl/traps.py): hand-computed host signals,
threshold/first-reason semantics, partitioning invariance, and the
DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.crawl import traps


def _log():
    rows = []
    for i in range(5):
        rows.append((f"https://ok.test/cat/{i}", f"fp{i}"))
    rows.append(("https://ok.test/about/team", "fpA"))
    # re-fetch churn: same URL twice, unchanged bytes
    rows.append(("https://ok.test/cat/0", "fp0"))
    for y in range(20):
        for m in range(20):
            rows.append((f"https://trap.test/cal/{2000 + y}/{m}", f"c{y}.{m}"))
    rows.append(("https://deep.test/a/b/c/d/e/f/g/h/i/1", "fpD"))
    for i in range(30):
        rows.append((f"https://mirror.test/p/{i}x{i}", "SAME"))
    return rows


@pytest.fixture(scope="module")
def flagged(spark):
    df = spark.createDataFrame(_log(), "url string, fingerprint string")
    stats = traps.host_trap_stats(df, fingerprint_col="fingerprint")
    out = traps.flag_traps(
        stats, max_urls_per_template=100, max_depth=8, max_dup_ratio=0.9
    )
    return {r["host"]: r.asDict() for r in out.collect()}


def test_hand_computed_signals(flagged):
    ok = flagged["ok.test"]
    # 6 urls over 2 templates (/cat/N, /about/team); 7 fetches
    assert ok["n_fetches"] == 7 and ok["n_urls"] == 6
    assert ok["n_templates"] == 2 and ok["urls_per_template"] == 3.0
    assert ok["max_depth"] == 2
    # 6 distinct fingerprints over 7 fetches
    assert ok["dup_content_ratio"] == pytest.approx(1 - 6 / 7)
    assert not ok["is_trap"] and ok["trap_reason"] is None

    trap = flagged["trap.test"]
    assert trap["n_templates"] == 1 and trap["urls_per_template"] == 400.0
    assert trap["trap_reason"] == "template_explosion"


def test_first_reason_priority_and_depth(flagged):
    # deep.test only trips depth; mirror.test only trips dup bytes
    assert flagged["deep.test"]["trap_reason"] == "depth"
    assert flagged["deep.test"]["max_depth"] == 10
    assert flagged["mirror.test"]["trap_reason"] == "dup_content"
    assert flagged["mirror.test"]["dup_content_ratio"] > 0.9
    # trap.test trips template_explosion FIRST even though its
    # calendar depth is healthy and bytes are distinct
    assert flagged["trap.test"]["is_trap"]


def test_uppercase_scheme_extracts_host(spark):
    """Schemes are case-insensitive (RFC 3986) and real fetch logs
    carry 'HTTP://' rows — a lowercase-only anchor pooled them all
    into one phantom '' host."""
    from webscrape_neko_jirushi_spark.crawl.traps import host_of, path_of
    from pyspark.sql import functions as F

    rows = spark.createDataFrame(
        [("HTTP://A.test/x/1",), ("https://a.test/x/2",)], "url string"
    ).select(
        host_of(F.col("url")).alias("h"), path_of(F.col("url")).alias("p")
    )
    got = [(r["h"], r["p"]) for r in rows.collect()]
    assert got == [("A.test", "/x/1"), ("a.test", "/x/2")]


def test_no_fingerprint_column(spark):
    df = spark.createDataFrame(
        [(u,) for u, _ in _log()], "url string"
    )
    out = traps.flag_traps(traps.host_trap_stats(df))
    cols = out.columns
    assert "dup_content_ratio" not in cols
    got = {r["host"]: r["trap_reason"] for r in out.collect()}
    # mirror farm is invisible without fingerprints (stays below the
    # default 300 urls/template), calendar still caught
    assert got["mirror.test"] is None
    assert got["trap.test"] == "template_explosion"


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(_log(), "url string, fingerprint string")
    a = traps.flag_traps(
        traps.host_trap_stats(df, fingerprint_col="fingerprint")
    ).collect()
    b = traps.flag_traps(
        traps.host_trap_stats(
            df.repartition(13), fingerprint_col="fingerprint"
        )
    ).collect()
    key = lambda r: r["host"]  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )


def test_duckdb_twin(spark):
    df = spark.createDataFrame(_log(), "url string, fingerprint string")
    got = sorted(
        tuple(r)
        for r in traps.flag_traps(
            traps.host_trap_stats(df, fingerprint_col="fingerprint"),
            max_urls_per_template=100,
            max_depth=8,
            max_dup_ratio=0.9,
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "fl", pd.DataFrame(_log(), columns=["url", "fingerprint"])
    )
    ctes = traps.trap_sql_ctes(
        "SELECT url, fingerprint FROM fl", True, 100, 8, 0.9
    )
    want = sorted(
        tuple(r)
        for r in con.execute(f"WITH {ctes} SELECT * FROM traps").fetchall()
    )
    assert got == want

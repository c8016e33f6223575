"""Boilerplate span detection (text/boilerplate.py): hand-built host
chrome, the min-pages evidence floor, strip parity with the flagged
set, plan shape, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.plans.inspect import physical_plan
from webscrape_neko_jirushi_spark.text import boilerplate


def _spans():
    rows = []
    # host A: 10 pages, NAV on all, FOOTER on 6/10, unique content
    for p in range(10):
        rows.append(("a", p, "NAV home about"))
        if p < 6:
            rows.append(("a", p, "FOOTER copyright"))
        rows.append(("a", p, f"article body {p}"))
        # the nav repeats twice on page 0 — still one page of evidence
        if p == 0:
            rows.append(("a", p, "NAV home about"))
    # host B: only 3 pages — below the evidence floor, nothing flagged
    for p in range(3):
        rows.append(("b", 100 + p, "NAV home about"))
        rows.append(("b", 100 + p, f"post {p}"))
    return rows


@pytest.fixture(scope="module")
def spans(spark):
    return spark.createDataFrame(
        _spans(), "host string, page_id long, text string"
    )


@pytest.fixture(scope="module")
def keys(spark, spans):
    return boilerplate.boilerplate_keys(spans, min_pages=5, frac=0.5)


def test_detection_and_evidence_floor(keys):
    out = {
        (r["host"], r["n_pages_with_span"], r["is_boilerplate"])
        for r in keys.collect()
    }
    # host A nav: 10/10 pages (dup on page 0 counted once) -> flagged
    assert ("a", 10, True) in out
    # host A footer: 6/10 > 0.5 -> flagged
    assert ("a", 6, True) in out
    # host B nav on 3/3 pages but host has < 5 pages -> NOT flagged
    assert ("b", 3, False) in out
    # content spans never flagged
    flagged = [r for r in keys.collect() if r["is_boilerplate"]]
    assert len(flagged) == 2


def test_strip_keeps_content(spark, spans, keys):
    kept = boilerplate.strip_boilerplate(spans, keys)
    rows = kept.collect()
    texts_a = [r["text"] for r in rows if r["host"] == "a"]
    assert all(t.startswith("article") for t in texts_a)
    assert len(texts_a) == 10
    # host B untouched (below the evidence floor)
    texts_b = sorted(r["text"] for r in rows if r["host"] == "b")
    assert sum(t == "NAV home about" for t in texts_b) == 3


def test_strip_join_is_broadcast(spark, spans, keys):
    plan = physical_plan(boilerplate.strip_boilerplate(spans, keys))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partitioning_invariance(spark, spans):
    a = sorted(
        tuple(r)
        for r in boilerplate.boilerplate_keys(spans).collect()
    )
    b = sorted(
        tuple(r)
        for r in boilerplate.boilerplate_keys(
            spans.repartition(11)
        ).collect()
    )
    assert a == b


def test_duckdb_twin(spark, spans):
    got = sorted(
        tuple(r)
        for r in boilerplate.boilerplate_keys(
            spans, min_pages=5, frac=0.5
        ).collect()
    )
    con = duckdb.connect()
    con.register(
        "sp", pd.DataFrame(_spans(), columns=["host", "page_id", "text"])
    )
    ctes = boilerplate.boilerplate_sql_ctes("SELECT * FROM sp", 5, 0.5)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {ctes} SELECT * FROM bp_keys"
        ).fetchall()
    )
    assert got == want

"""Anchor-text aggregation (operators/anchors.py): hand-computed
winners, tie-breaks, empty-anchor targets, partitioning invariance,
plan shape, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.operators import anchors
from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

EDGES = [
    (1, 100, "Great Cat Photos"),
    (2, 100, "cat photos!"),
    (3, 100, "the cat page"),
    (1, 200, ""),
    (2, 200, "---"),
    (4, 300, "dog dog cat"),
    (4, 300, "zebra cat"),
    (5, 400, "beta alpha"),
    (6, 400, "alpha beta"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, anchor string")


def test_hand_computed(spark, edges):
    out = {r["dst"]: r.asDict() for r in anchors.anchor_stats(edges).collect()}
    assert out[100]["n_inlinks"] == 3 and out[100]["n_sources"] == 3
    assert out[100]["top_term"] == "cat" and out[100]["top_count"] == 3
    # within-anchor repeats count per occurrence; src 4 links twice
    assert out[300]["n_inlinks"] == 2 and out[300]["n_sources"] == 1
    assert out[300]["top_term"] == "cat"  # dog=2, cat=2 -> term asc


def test_empty_anchor_target_kept(spark, edges):
    out = {r["dst"]: r.asDict() for r in anchors.anchor_stats(edges).collect()}
    assert out[200]["n_inlinks"] == 2
    assert out[200]["top_term"] is None and out[200]["top_count"] is None


def test_tie_breaks_to_smallest_term(spark, edges):
    out = {r["dst"]: r["top_term"] for r in anchors.anchor_stats(edges).collect()}
    assert out[400] == "alpha"  # alpha=2, beta=2


def test_partitioning_invariance(spark, edges):
    a = sorted(tuple(r) for r in anchors.anchor_stats(edges).collect())
    b = sorted(
        tuple(r) for r in anchors.anchor_stats(edges.repartition(7)).collect()
    )
    assert a == b


def test_no_window_over_exploded_terms(spark, edges):
    # the winner must come from an aggregate, not a Window sort over
    # the (dst, term) table — Window would single-task a hot target
    plan = physical_plan(anchors.anchor_stats(edges))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duckdb_twin(spark, edges):
    got = sorted(tuple(r) for r in anchors.anchor_stats(edges).collect())
    con = duckdb.connect()
    con.register("e", pd.DataFrame(EDGES, columns=["src", "dst", "anchor"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH {anchors.anchor_sql_ctes('SELECT * FROM e')} "
            "SELECT * FROM anchors"
        ).fetchall()
    )
    assert got == want

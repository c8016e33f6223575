"""PageRank (operators/graph.py): numpy power-iteration mirror,
dangling-mass redistribution, invariants, the DuckDB twin, and input
validation."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.operators import graph

# a small digraph with a hub (d), a dangling node (e), and a 2-cycle
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
    ("d", "a"), ("d", "e"), ("b", "a"),
]


def numpy_pagerank(edges, n_iters, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        dm = r[deg == 0].sum()
        nr = np.full(n, (1.0 - d) / n)
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / deg[idx[u]]
        nr += d * (contrib + dm / n)
        r = nr
    return {nodes[i]: r[i] for i in range(n)}


@pytest.fixture(scope="module")
def edges_df(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string").cache()
    yield df
    df.unpersist()


def test_matches_numpy_mirror(spark, edges_df):
    got = {
        r["node"]: (r["rank"], r["rank_norm"])
        for r in graph.pagerank(edges_df, n_iters=5).collect()
    }
    want = numpy_pagerank(EDGES, 5)
    assert set(got) == set(want)
    for node, w in want.items():
        assert got[node][0] == pytest.approx(w, abs=1e-12)
        assert got[node][1] == round(w * len(want), 6)


def test_rank_mass_conserved_with_dangling(spark, edges_df):
    """Dangling redistribution keeps total rank at 1.0 — without it,
    rank leaks out of the graph every iteration (node e absorbs and
    re-emits mass here)."""
    out = graph.pagerank(edges_df, n_iters=4).collect()
    assert sum(r["rank"] for r in out) == pytest.approx(1.0, abs=1e-9)


def test_cycle_stays_uniform(spark):
    cyc = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    out = graph.pagerank(cyc, n_iters=3).collect()
    assert all(r["rank_norm"] == 1.0 for r in out)


def test_duckdb_twin(spark):
    """Differential vs the unrolled SQL twin on a seeded pseudo-random
    digraph — the driver gate's exact comparison on rank_norm."""
    rng = np.random.RandomState(7)
    edges = sorted(
        {
            (f"n{rng.randint(40)}", f"n{rng.randint(40)}")
            for _ in range(150)
        }
    )
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(sdf, n_iters=2).collect()
    }
    con = duckdb.connect()
    con.register("raw_edges", pd.DataFrame(edges, columns=["src", "dst"]))
    sql = (
        "WITH "
        + graph.pagerank_sql_ctes("SELECT DISTINCT src, dst FROM raw_edges", 2)
        + " SELECT node, rank_norm FROM pr"
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_hint_and_partitioning_independence(spark, edges_df):
    base = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(edges_df, n_iters=3).collect()
    }
    hinted = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(
            edges_df.repartition(7), n_iters=3, n_nodes=5
        ).collect()
    }
    assert base == hinted


def test_multi_edges_dedup(spark):
    """dedup_edges collapses repeated links (a page linking twice is
    one edge); dedup_edges=False keeps the multigraph weighting."""
    multi = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
        "src string, dst string",
    )
    dd = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(multi, n_iters=2).collect()
    }
    simple = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(
            multi.dropDuplicates(["src", "dst"]), n_iters=2
        ).collect()
    }
    assert dd == simple
    raw = {
        r["node"]: r["rank_norm"]
        for r in graph.pagerank(multi, n_iters=2, dedup_edges=False).collect()
    }
    assert raw[("b")] > simple["b"]  # the doubled a->b edge shifts mass


def test_validation(spark, edges_df):
    with pytest.raises(ValueError, match="n_iters"):
        graph.pagerank(edges_df, n_iters=0)
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(edges_df, damping=1.0)
    bad = spark.createDataFrame(
        [("a", None), ("a", "b")], "src string, dst string"
    )
    # in-plan raise (fires during the one checkpoint scan — no
    # separate eager count job over an expensive upstream)
    with pytest.raises(Exception, match="NULL src/dst"):
        graph.pagerank(bad, n_iters=1)
    # NULL SRC would vanish in the out_deg equi-join before a
    # post-join guard could see it — must still raise
    bad_src = spark.createDataFrame(
        [(None, "b"), ("a", "b")], "src string, dst string"
    )
    with pytest.raises(Exception, match="NULL src/dst"):
        graph.pagerank(bad_src, n_iters=1)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        graph.pagerank(empty, n_iters=1)


# ===========================================================================
# X59: redirect-chain resolution (pointer doubling)
# ===========================================================================

def _redir(spark, pairs, max_hops=20):
    df = spark.createDataFrame(pairs, "src string, dst string")
    out = graph.resolve_redirects(df, max_hops=max_hops)
    return {r["src"]: (r["final"], r["hops"], r["status"]) for r in out.collect()}


def test_redirect_chain_exact_hops(spark):
    got = _redir(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, "ok"),
        "b": ("d", 2, "ok"),
        "c": ("d", 1, "ok"),
    }


def test_redirect_cycle_and_truncation(spark):
    pairs = [("x", "y"), ("y", "x")] + [
        (f"n{i}", f"n{i+1}") for i in range(8)
    ]  # chain n0..n8 of length 8
    got = _redir(spark, pairs, max_hops=5)
    assert got["x"] == (None, None, "unresolved")
    assert got["y"] == (None, None, "unresolved")
    assert got["n0"] == (None, None, "unresolved")  # 8 hops > 5
    assert got["n3"] == ("n8", 5, "ok")             # exactly at the cap
    assert got["n4"] == ("n8", 4, "ok")


def test_redirect_boundary_chain_equals_cap(spark):
    pairs = [(f"c{i}", f"c{i+1}") for i in range(20)]
    got = _redir(spark, pairs, max_hops=20)
    assert got["c0"] == ("c20", 20, "ok")


def test_redirect_duckdb_twin(spark):
    import random

    rng = random.Random(7)
    # random functional graph over 200 nodes incl. self-feeding loops
    pairs = [(f"u{i}", f"u{rng.randrange(200)}") for i in range(0, 200, 2)]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = sorted(
        tuple(r)
        for r in graph.resolve_redirects(df, max_hops=12).collect()
    )
    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(pairs, columns=["src", "dst"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH RECURSIVE "
            + graph.resolve_redirects_sql_ctes(
                "SELECT DISTINCT src, dst FROM pairs", max_hops=12
            )
            + " SELECT src, final, hops, status FROM redir"
        ).fetchall()
    )
    assert got == want


def test_redirect_validation(spark):
    bad = spark.createDataFrame([("a", "b"), ("a", "c")], "src string, dst string")
    with pytest.raises(ValueError, match="functional"):
        graph.resolve_redirects(bad)
    nul = spark.createDataFrame([("a", None)], "src string, dst string")
    with pytest.raises(ValueError, match="NULL"):
        graph.resolve_redirects(nul)

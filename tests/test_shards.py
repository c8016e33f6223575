"""Token-balanced shard assignment (text/packing.py::assign_shards):
the within-one-document balance bound, determinism across
partitioning and bucketing modes, edge cases, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import packing

DOCS = [(i, "w " * ((i * 37) % 90 + 1)) for i in range(200)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_balance_bound(docs):
    n_shards = 8
    out = packing.assign_shards(docs, n_shards, buckets=0).collect()
    assert {r["shard_id"] for r in out} == set(range(n_shards))
    tokens = {}
    max_doc = 0
    for r in out:
        tokens[r["shard_id"]] = tokens.get(r["shard_id"], 0) + r["n_tokens"]
        max_doc = max(max_doc, r["n_tokens"])
    total = sum(tokens.values())
    ideal = total / n_shards
    # contiguous stream intervals: each shard within one document of
    # ideal
    for s, t in tokens.items():
        assert abs(t - ideal) <= max_doc, (s, t, ideal, max_doc)


def test_deterministic_and_mode_parity(spark, docs):
    a = sorted(
        tuple(r) for r in packing.assign_shards(docs, 8, buckets=0).collect()
    )
    b = sorted(
        tuple(r)
        for r in packing.assign_shards(
            docs.repartition(13), 8, buckets=0
        ).collect()
    )
    c = sorted(
        tuple(r) for r in packing.assign_shards(docs, 8, buckets=4).collect()
    )
    assert a == b  # partitioning-invariant
    assert a == c  # bucketed two-phase == single window


def test_edges(spark):
    empty_and_tiny = spark.createDataFrame(
        [(1, ""), (2, "one two three")], "doc_id long, text string"
    )
    out = packing.assign_shards(empty_and_tiny, 4, buckets=0).collect()
    # zero-token doc dropped; the only doc owns shard 0
    assert [(r["doc_id"], r["shard_id"]) for r in out] == [(2, 0)]
    with pytest.raises(ValueError, match="n_shards"):
        packing.assign_shards(empty_and_tiny, 0)


def test_n_rows_hint_no_job(docs):
    # the hint path must not trigger the LIMIT-bounded probe job at
    # construction time: building the plan schedules no Spark jobs
    sc = docs.sparkSession.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    df = packing.assign_shards(docs, 8, n_rows=200)
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before)
    assert df.columns == ["doc_id", "n_tokens", "shard_id"]


def test_duckdb_twin(spark, docs):
    got = sorted(
        tuple(r) for r in packing.assign_shards(docs, 8, buckets=0).collect()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            packing.assign_shards_sql(8, relation="d")
        ).fetchall()
    )
    assert got == want

"""Sequence packing (text/packing.py): tiling/fullness invariants,
partitioning-independence, single-vs-bucketed parity, and the DuckDB
twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.sources.synth_corpus import synth_documents
from webscrape_neko_jirushi_spark.text import packing

BUDGET = 64


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_documents(spark, 400, dup_frac=0.0).cache()
    yield docs
    docs.unpersist()


def _rows(df):
    return sorted(
        (r["doc_id"], r["seq_id"], r["doc_offset"], r["seq_offset"], r["n_tokens"])
        for r in df.collect()
    )


def test_null_id_fails_loudly(spark):
    """A NULL id cannot hold a deterministic stream position (NULL
    hashes collide into one RANGE-frame tie / NULL bucket) — both
    pack_sequences paths must raise, never overlap fragments or drop
    the row."""
    docs = spark.createDataFrame(
        [(1, "some words here"), (None, "other words there")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="NULL id"):
        packing.pack_sequences(docs, budget=4, buckets=0).collect()
    with pytest.raises(Exception, match="NULL id"):
        packing.pack_sequences(docs, budget=4, buckets=8).collect()


def test_pack_invariants(spark, corpus):
    out = packing.pack_sequences(corpus, BUDGET, buckets=0).cache()

    # every sequence except the last is exactly full, none overflow
    per_seq = {
        r["seq_id"]: r["tok"]
        for r in out.groupBy("seq_id").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # contiguous seq ids from 0
    assert all(per_seq[s] == BUDGET for s in per_seq if s != last)
    assert 0 < per_seq[last] <= BUDGET

    # a document's fragments tile [0, n) in order: offsets are the
    # running sum of fragment lengths, and they total the doc's tokens
    n_tok = {
        r["doc_id"]: r["n"]
        for r in corpus.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
        ).collect()
    }
    frags: dict[int, list[tuple[int, int, int]]] = {}
    for d, s, doff, soff, n in _rows(out):
        frags.setdefault(d, []).append((s, doff, n))
    for d, fl in frags.items():
        fl.sort()
        acc = 0
        for _, doff, n in fl:
            assert doff == acc
            acc += n
        assert acc == n_tok[d]

    # fragments within a sequence tile [0, budget) the same way
    by_seq: dict[int, list[tuple[int, int]]] = {}
    for _, s, _, soff, n in _rows(out):
        by_seq.setdefault(s, []).append((soff, n))
    for s, fl in by_seq.items():
        fl.sort()
        acc = 0
        for soff, n in fl:
            assert soff == acc
            acc += n
    out.unpersist()

    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(corpus, 0)


def test_pack_deterministic_and_bucketed_parity(spark, corpus):
    single = _rows(packing.pack_sequences(corpus, BUDGET, buckets=0))
    again = _rows(
        packing.pack_sequences(corpus.repartition(7), BUDGET, buckets=0)
    )
    assert single == again  # partitioning-independent
    bucketed = _rows(packing.pack_sequences(corpus, BUDGET, buckets=5))
    assert single == bucketed  # two-phase prefix sum == one window
    hinted = _rows(
        packing.pack_sequences(corpus, BUDGET, n_rows=400)
    )  # auto gate resolves from the hint (below threshold -> single)
    assert single == hinted


def test_pack_tokens_col_and_zero_docs(spark, corpus):
    """A precomputed count column is used verbatim; zero-token docs
    vanish from the stream."""
    withn = corpus.withColumn(
        "n_tok", F.size(F.split(F.trim("text"), r"\s+"))
    ).withColumn(
        "n_tok", F.when(F.col("doc_id") % 7 == 0, 0).otherwise(F.col("n_tok"))
    )
    out = packing.pack_sequences(
        withn, BUDGET, tokens_col="n_tok", buckets=0
    )
    ids = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert all(d % 7 != 0 for d in ids)
    total = out.agg(F.sum("n_tokens")).head()[0]
    want = withn.filter(F.col("n_tok") > 0).agg(F.sum("n_tok")).head()[0]
    assert total == want


def test_pack_matches_duckdb_twin(spark, corpus):
    import duckdb

    got = _rows(packing.pack_sequences(corpus, BUDGET, buckets=0))
    con = duckdb.connect()
    rows = corpus.select("doc_id", "text").collect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(r["doc_id"], r["text"]) for r in rows],
    )
    want = sorted(
        tuple(int(x) for x in row)
        for row in con.execute(packing.pack_sequences_sql(BUDGET)).fetchall()
    )
    assert got == want

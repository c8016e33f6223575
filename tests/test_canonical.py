"""Quality-argmax keep policy over duplicate clusters
(operators/dedup.py::cluster_canonical / keep_canonical): winner
selection, tie-breaks, singleton survival, partitioning invariance,
and the DuckDB twin of the winner rule."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import dedup

# clusters: {1,2,3} (q = 5, 9, 9 -> winner 2: max q, tie -> min id),
# {10,11} (q = 4, 7 -> winner 11), unclustered singletons 20, 21
DOCS = [
    (1, 5, "a"),
    (2, 9, "b"),
    (3, 9, "c"),
    (10, 4, "d"),
    (11, 7, "e"),
    (20, 1, "f"),
    (21, 3, "g"),
]
LABELS = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, q long, text string")


@pytest.fixture(scope="module")
def labels(spark):
    return spark.createDataFrame(LABELS, "id long, cluster_id long")


def test_winner_is_quality_argmax_min_id_tiebreak(docs, labels):
    rows = {
        r["cluster_id"]: r.asDict()
        for r in dedup.cluster_canonical(docs, labels, "q").collect()
    }
    assert rows[1]["kept_id"] == 2  # q ties 9/9 -> lowest id
    assert rows[1]["kept_quality"] == 9
    assert rows[1]["n_docs"] == 3
    assert rows[1]["q_min"] == 5
    assert rows[10]["kept_id"] == 11  # strict max
    assert rows[10]["kept_quality"] == 7


def test_keep_canonical_survivors(docs, labels):
    kept = sorted(
        r["doc_id"]
        for r in dedup.keep_canonical(docs, labels, "q").collect()
    )
    # winners 2, 11 + singletons 20, 21; originals 1, 3, 10 removed
    assert kept == [2, 11, 20, 21]


def test_keep_canonical_preserves_schema(docs, labels):
    out = dedup.keep_canonical(docs, labels, "q")
    assert out.columns == docs.columns
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[2] == "b" and texts[20] == "f"


def test_partitioning_invariance(docs, labels):
    base = sorted(
        tuple(r) for r in dedup.cluster_canonical(docs, labels, "q").collect()
    )
    for n in (1, 7):
        again = sorted(
            tuple(r)
            for r in dedup.cluster_canonical(
                docs.repartition(n), labels.repartition(n), "q"
            ).collect()
        )
        assert again == base


def test_label_for_missing_doc_ignored(spark, docs):
    # a label row whose id is not in docs must not fabricate a winner
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (999, 1)], "id long, cluster_id long"
    )
    rows = dedup.cluster_canonical(docs, labels, "q").collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["kept_id"] == 2


def test_twin_rowbased_winner(docs, labels):
    """The ROW_NUMBER twin (ORDER BY q DESC, id ASC) selects the same
    winners — the rule the driver oracle uses."""
    got = {
        (r["cluster_id"], r["kept_id"], r["kept_quality"])
        for r in dedup.cluster_canonical(docs, labels, "q").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, q BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)", [(i, q) for i, q, _ in DOCS])
    con.execute("CREATE TABLE l(id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", LABELS)
    want = {
        tuple(r)
        for r in con.execute(
            """
            SELECT cluster_id, doc_id, q FROM (
              SELECT l.cluster_id, d.doc_id, d.q,
                     ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                        ORDER BY d.q DESC, d.doc_id ASC) AS rn
              FROM d JOIN l ON d.doc_id = l.id
            ) WHERE rn = 1
            """
        ).fetchall()
    }
    assert got == want


def test_composes_with_connected_components(spark):
    """End-to-end: pair evidence -> clusters -> quality-argmax keep."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    docs = spark.createDataFrame(
        [(i, q, "t") for i, q, _ in DOCS], "doc_id long, q long, text string"
    )
    labels = dedup.connected_components(edges)
    kept = sorted(
        r["doc_id"] for r in dedup.keep_canonical(docs, labels, "q").collect()
    )
    assert kept == [2, 11, 20, 21]

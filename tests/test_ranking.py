"""BM25 scoring (text/ranking.py): hand-computed scores, edge cases,
plan shape (map-side, no explode/shuffle of the corpus), and the
bit-identical DuckDB twin."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.plans.inspect import physical_plan
from webscrape_neko_jirushi_spark.text import ranking

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "cat cat cat dog"),
    (3, "a completely unrelated document about spark"),
    (4, ""),
    (5, "dog park dog park dog"),
]
TERMS = ["cat", "dog", "mat"]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in ranking.bm25_scores(df, TERMS).collect()
    }


def _bm25_ref(tf, df_t, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_hand_computed(scored):
    # corpus: N=5, sum dl = 21, avgdl = 4.2
    # doc 2: cat tf=3 df=2, dog tf=1 df=2, dl=4
    want = _bm25_ref(3, 2, 5, 4, 4.2) + _bm25_ref(1, 2, 5, 4, 4.2)
    assert scored[2]["bm25"] == pytest.approx(want, rel=1e-12)
    assert scored[2]["n_matched"] == 2 and scored[2]["dl"] == 4


def test_rare_term_outranks_common_at_equal_tf(scored):
    # doc 1 matches cat(df=2) AND mat(df=1): the rarer term must
    # contribute more than another cat would
    one_cat = _bm25_ref(1, 2, 5, 6, 4.2)
    one_mat = _bm25_ref(1, 1, 5, 6, 4.2)
    assert one_mat > one_cat
    assert scored[1]["bm25"] == pytest.approx(one_cat + one_mat, rel=1e-12)


def test_no_match_and_empty_doc(scored):
    assert scored[3]["bm25"] == 0.0 and scored[3]["n_matched"] == 0
    assert scored[4]["bm25"] == 0.0 and scored[4]["dl"] == 0


def test_validates_terms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="query_terms"):
        ranking.bm25_scores(df, [])
    with pytest.raises(ValueError, match="query_terms"):
        ranking.bm25_sql("SELECT 1", ["", ""])


def test_plan_is_mapside_scan(spark):
    # the corpus must not be exploded or shuffled: the only exchange
    # feeds the 1-row stats aggregate, joined back by broadcast
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = physical_plan(ranking.bm25_scores(df, TERMS))
    assert "Generate" not in plan  # no explode
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar join


def test_duckdb_twin_bit_identical(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in ranking.bm25_scores(df, TERMS).collect()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            ranking.bm25_sql("SELECT * FROM d", TERMS)
        ).fetchall()
    )
    assert got == want  # ==, not approx: integer-exact stats +
    # fixed-order fold make the doubles bit-identical

"""Hashed-feature logistic classifier (text/classifier.py): closed-form
round-1 check, separable-corpus learning, the unrolled DuckDB twin,
and validation."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import classifier

# two fully separable vocabularies -> a linear model must reach
# accuracy 1.0 in a few full-batch rounds
POS_WORDS = ["alpha", "bravo", "charlie", "delta"]
NEG_WORDS = ["zulu", "yankee", "xray", "whiskey"]
DOCS = [
    (i, " ".join(POS_WORDS[j % 4] for j in range(i % 5 + 3)), 1)
    for i in range(10)
] + [
    (i + 10, " ".join(NEG_WORDS[j % 4] for j in range(i % 4 + 3)), 0)
    for i in range(10)
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, label int"
    ).cache()
    yield df
    df.unpersist()


def test_round1_closed_form(spark, docs):
    """Zero init makes round 1 exact: p = 0.5 for every doc, so
    w1[b] = -lr * sum_docs(x_b * (0.5 - y)) / n."""
    dim = 16
    feats = classifier.hashed_features(docs, dim=dim, label_col="label")
    rows = feats.collect()
    n = len({r["doc_id"] for r in rows})
    expected = [0.0] * dim
    for r in rows:
        expected[int(r["bucket"])] -= r["x"] * (0.5 - r["y"]) / n
    w, b = classifier.train_logreg(feats, dim=dim, n_iters=1, lr=1.0)
    assert w == pytest.approx(expected, abs=1e-12)
    # labels are balanced 10/10 -> mean residual 0 -> bias stays 0
    assert b == pytest.approx(0.0, abs=1e-12)


def test_learns_separable_corpus(spark, docs):
    dim = 32
    feats = classifier.hashed_features(docs, dim=dim, label_col="label")
    w, b = classifier.train_logreg(feats, dim=dim, n_iters=5, lr=2.0)
    out = classifier.predict(feats, w, b).collect()
    assert all((r["p"] >= 0.5) == (r["y"] == 1.0) for r in out)
    # scores strictly separate after 5 rounds
    pos = min(r["p"] for r in out if r["y"] == 1.0)
    neg = max(r["p"] for r in out if r["y"] == 0.0)
    assert pos > 0.6 > 0.4 > neg


def test_duckdb_twin(spark, docs):
    """Weights AND scores after 2 unrolled rounds match the SQL twin
    at 6 decimals (the driver gate's comparison)."""
    dim = 16
    feats = classifier.hashed_features(docs, dim=dim, label_col="label")
    w, b = classifier.train_logreg(feats, dim=dim, n_iters=2, lr=1.0)
    scores = {
        r["doc_id"]: round(r["p"], 6)
        for r in classifier.predict(feats, w, b).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(DOCS, columns=["doc_id", "text", "label"]),
    )
    ctes = classifier.logreg_sql_ctes(
        dim, n_iters=2, lr=1.0, label_sql="CAST(label AS DOUBLE)"
    )
    wt = dict(
        con.execute(
            f"WITH {ctes} SELECT bucket, ROUND(weight, 6) FROM w2"
        ).fetchall()
    )
    for j in range(dim):
        assert round(w[j], 6) == wt[j], f"bucket {j}"
    bias = con.execute(f"WITH {ctes} SELECT ROUND(bias, 6) FROM b2").fetchone()[0]
    assert round(b, 6) == bias
    sc = dict(
        con.execute(
            f"WITH {ctes} SELECT doc_id, ROUND(p, 6) FROM score2"
        ).fetchall()
    )
    assert scores == sc


def test_hint_parity_and_predict_unlabeled(spark, docs):
    dim = 8
    feats = classifier.hashed_features(docs, dim=dim, label_col="label")
    a = classifier.train_logreg(feats, dim=dim, n_iters=2)
    h = classifier.train_logreg(feats, dim=dim, n_iters=2, n_docs=20)
    assert a == h
    unlabeled = classifier.hashed_features(docs, dim=dim)
    out = classifier.predict(unlabeled, *a).collect()
    assert len(out) == 20 and all(0.0 < r["p"] < 1.0 for r in out)
    plan = classifier.predict(unlabeled, *a)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan  # literal-array lookup, no UDF


def test_validation(spark, docs):
    feats = classifier.hashed_features(docs, dim=4, label_col="label")
    with pytest.raises(ValueError, match="dim"):
        classifier.hashed_features(docs, dim=0)
    with pytest.raises(ValueError, match="n_iters"):
        classifier.train_logreg(feats, dim=4, n_iters=0)
    with pytest.raises(ValueError, match="label"):
        classifier.train_logreg(
            classifier.hashed_features(docs, dim=4), dim=4
        )

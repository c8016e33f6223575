"""Distributed PCA (operators/projection.py): moments vs numpy,
eigh mirror, sign determinism, projection fold parity (numpy and
DuckDB), whitening variance, plan shape, and guards."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import projection

DIM, K, N = 8, 3, 400
RNG = np.random.default_rng(20260818)
# anisotropic data: distinct variances per axis + cross-correlation
_BASE = RNG.normal(size=(N, DIM)) * np.array([5, 3, 2, 1, 1, 0.5, 0.2, 0.1])
_BASE[:, 1] += 0.7 * _BASE[:, 0]
_BASE += RNG.normal(size=DIM)  # nonzero mean


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, [float(x) for x in _BASE[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_second_moments_match_numpy(emb):
    n, s, ss = projection.second_moments(emb, DIM)
    assert n == N
    np.testing.assert_allclose(s, _BASE.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(ss, _BASE.T @ _BASE, rtol=1e-12)


def test_moments_partition_invariant(emb):
    a = projection.second_moments(emb.repartition(1), DIM)
    b = projection.second_moments(emb.repartition(13), DIM)
    assert a[0] == b[0]
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-12)


def test_pca_matches_numpy_eigh(emb):
    m = projection.pca_train(emb, DIM, K)
    cov = np.cov(_BASE, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    np.testing.assert_allclose(m.eigenvalues, evals[:K], rtol=1e-8)
    W = np.array(m.components)
    # orthonormal rows
    np.testing.assert_allclose(W @ W.T, np.eye(K), atol=1e-9)
    # each row is an eigenvector of cov
    for row, ev in zip(W, m.eigenvalues):
        np.testing.assert_allclose(cov @ row, ev * row, atol=1e-7)
    # deterministic sign: the largest-|weight| coord is positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projection_matches_numpy(emb):
    m = projection.pca_train(emb, DIM, K)
    got = {
        r["vec_id"]: r["proj"]
        for r in projection.pca_project(emb, m).collect()
    }
    W = np.array(m.components)
    ref = (_BASE - np.array(m.mean)) @ W.T
    for i in range(N):
        np.testing.assert_allclose(got[i], ref[i], atol=1e-9)


def test_whiten_unit_variance(emb):
    m = projection.pca_train(emb, DIM, K)
    out = projection.pca_project(emb, m, whiten=True)
    rows = np.array([r["proj"] for r in out.collect()])
    np.testing.assert_allclose(rows.var(axis=0), np.ones(K), rtol=1e-4)


def test_projection_is_map_side(emb):
    from webscrape_neko_jirushi_spark.plans.inspect import physical_plan

    m = projection.pca_train(emb, DIM, K)
    plan = physical_plan(projection.pca_project(emb, m))
    for op in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan


def test_duckdb_fold_twin(emb):
    m = projection.pca_train(emb, DIM, K)
    got = {
        r["vec_id"]: r["proj"]
        for r in projection.pca_project(emb, m).collect()
    }
    w_sql = projection.sql_matrix_literal(m.components)
    mean_sql = projection.sql_vector_literal(m.mean)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)",
        [(i, [float(x) for x in _BASE[i]]) for i in range(N)],
    )
    exprs = ", ".join(
        projection.projection_fold_sql(
            "embedding", w_sql, j, DIM, mean_sql
        ) + f" AS p{j}"
        for j in range(K)
    )
    for row in con.execute(f"SELECT vec_id, {exprs} FROM e").fetchall():
        i, *ps = row
        for j in range(K):
            assert got[i][j] == ps[j], f"vec {i} comp {j}"  # bit-identical


def test_guards(emb, spark):
    with pytest.raises(ValueError, match="1 <= k"):
        projection.pca_train(emb, DIM, 0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        projection.second_moments(empty, DIM)
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="expected dim"):
        projection.second_moments(bad, DIM)

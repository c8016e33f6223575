"""Distributed PCA / whitening over embedding columns — the
dimensionality-reduction preprocessing the ANN/PQ stack wants (OPQ
rotates with exactly this decomposition; whitening before hyperplane
LSH equalizes variance so every band carries information; SemDeDup
prunes in a reduced space). The reference has no embedding math at
all; first-class per the build brief's embedding-toolkit mandate.

Scale shape (the only part that touches the corpus):

- ``moment_partials`` — ONE Arrow ``mapInPandas`` pass emitting ONE
  row per PARTITION: ``[n, sum(x), flatten(X^T X)]`` accumulated in
  numpy across the partition's batches (d=64 -> 4,161 doubles/row).
  The corpus is scanned once; what shuffles afterwards is
  partition-count-sized, never row-count-sized.
- ``second_moments`` — one posexplode + ``groupBy(pos).sum`` reduces
  the partials to ``d^2 + d + 1`` scalars on the driver (at 10^5
  partitions that is ~4e8 tiny rows through one shuffle — ordinary;
  the partials are localCheckpointed first so the corpus pass runs
  once, the edge-list-first discipline).
- ``pca_train`` — driver-side ``numpy.linalg.eigh`` on the d x d
  covariance (the Lloyd convention: the MODEL is d x d, driver-side;
  the DATA never moves). Deterministic sign convention: each
  component's largest-|weight| coordinate (ties -> lowest index) is
  made positive, so results are reproducible across BLAS builds.
- ``project_col`` / ``pca_project`` — pure map-side Column math: per
  output component a FIXED-ORDER fold over ``zip_with(vec - mean,
  w)`` (left-to-right, the same order a DuckDB
  ``list_aggregate('sum')`` twin runs — bit-identical given the same
  literals), zero shuffles, zero Python at any corpus size.

Population covariance (divide by n), matching ``numpy.cov(...,
bias=True)``; whitening scales by ``1/sqrt(eigenvalue + eps)``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_partials(
    embeddings: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """One row per non-empty partition: ``flat`` = [n, s_0..s_{d-1},
    ss_00..ss_{dd}] (count, per-dim sum, flattened X^T X)."""

    def _acc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in it:
            if not len(pdf):
                continue
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if m.shape[1] != dim:
                raise ValueError(
                    f"moment_partials: expected dim {dim}, got {m.shape[1]}"
                )
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        if n:
            flat = np.concatenate(([float(n)], s, ss.ravel()))
            yield pd.DataFrame({"flat": [flat.tolist()]})

    return embeddings.select(vec_col).mapInPandas(
        _acc, "flat array<double>"
    )


def second_moments(
    embeddings: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """Aggregate the partials to (n, sum-vector, X^T X). One corpus
    pass (checkpointed partials), one partition-sized shuffle."""
    parts = moment_partials(embeddings, dim, vec_col).localCheckpoint(
        eager=True
    )
    summed = (
        parts.select(F.posexplode("flat").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + dim + dim * dim)
    for r in summed:
        flat[r["pos"]] = r["v"]
    n = int(round(flat[0]))
    if n == 0:
        raise ValueError("second_moments: empty embeddings input")
    return n, flat[1 : 1 + dim], flat[1 + dim :].reshape(dim, dim)


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]          # d
    components: list[list[float]]  # k x d, sign-fixed, variance-desc
    eigenvalues: list[float]   # k, descending
    n: int

    def whiten_scales(self, eps: float = 1e-8) -> list[float]:
        return [1.0 / float(np.sqrt(ev + eps)) for ev in self.eigenvalues]


def pca_train(
    embeddings: DataFrame,
    dim: int,
    k: int,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit top-k principal components of the embedding column. See
    module docstring for the distribution/determinism contract."""
    if not 1 <= k <= dim:
        raise ValueError(f"pca_train: need 1 <= k <= {dim}, got {k}")
    n, s, ss = second_moments(embeddings, dim, vec_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        v = evecs[:, idx].copy()
        pivot = int(np.argmax(np.abs(v)))  # ties: argmax -> lowest index
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(max(evals[idx], 0.0)))
    return PCAModel(
        mean=[float(x) for x in mean], components=comps,
        eigenvalues=eigs, n=n,
    )


def project_col(
    vec: Column,
    components: list[list[float]],
    mean: list[float] | None = None,
    scales: list[float] | None = None,
) -> Column:
    """array<double> of projections — per component a fixed-order
    fold over ``zip_with``; pure Column math (see module docstring)."""
    centered = (
        F.zip_with(
            vec,
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda a, b: a.cast("double") - b,
        )
        if mean is not None
        else F.transform(vec, lambda a: a.cast("double"))
    )
    out = []
    for j, row in enumerate(components):
        w = F.array(*[F.lit(float(x)) for x in row])
        acc = F.aggregate(
            F.zip_with(centered, w, lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        if scales is not None:
            acc = acc * F.lit(float(scales[j]))
        out.append(acc)
    return F.array(*out)


def pca_project(
    embeddings: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-8,
) -> DataFrame:
    """Append the k-dim (optionally whitened) projection. Map-side."""
    scales = model.whiten_scales(eps) if whiten else None
    return embeddings.withColumn(
        out_col,
        project_col(F.col(vec_col), model.components, model.mean, scales),
    )


def _dlit(x: float) -> str:
    # STRING-cast, not a bare numeric literal: DuckDB parses a bare
    # 17-digit literal as DECIMAL and DECIMAL->DOUBLE double-rounds
    # (measured: ~8% of uniform doubles land one ulp off), while
    # CAST('...' AS DOUBLE) goes through strtod — correctly rounded,
    # bit-exact against the repr round-trip. The '0.3 is DECIMAL'
    # gotcha, arbitrary-double form.
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def sql_vector_literal(vals: list[float]) -> str:
    """DuckDB DOUBLE[] literal, bit-exact per element (see ``_dlit``)."""
    return "[" + ", ".join(_dlit(x) for x in vals) + "]"


def sql_matrix_literal(rows: list[list[float]]) -> str:
    """DuckDB DOUBLE[][] literal, bit-exact per element."""
    return (
        "[" + ", ".join(sql_vector_literal(row) for row in rows) + "]"
    )


def projection_fold_sql(
    vec_expr: str, w_list_sql: str, j: int, dim: int,
    mean_list_sql: str | None = None,
) -> str:
    """DuckDB twin of one ``project_col`` component: the SAME
    left-to-right fold over the SAME literals (``w_list_sql`` is a
    SQL list-of-lists literal, 1-based component ``j+1``)."""
    if mean_list_sql is None:
        term = f"CAST({vec_expr}[i] AS DOUBLE) * {w_list_sql}[{j + 1}][i]"
    else:
        term = (
            f"(CAST({vec_expr}[i] AS DOUBLE) - {mean_list_sql}[i])"
            f" * {w_list_sql}[{j + 1}][i]"
        )
    return (
        f"COALESCE(list_aggregate(list_transform(range(1, {dim + 1}), "
        f"i -> {term}), 'sum'), 0.0)"
    )

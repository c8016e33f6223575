"""Differential fuzz of the EMBEDDING HYPERPLANE-LSH PATH vs DuckDB:
the text fuzz legs (test_fuzz_scalar / _minhash / _simhash) cover the
string hash families; this leg covers the numeric one under every
embedding near-dup and incremental-index result — md5-derived plane
weights, dot-product projection, 9-decimal sign quantization, and the
packed band bucket — bucket-by-bucket on an adversarial vector corpus
(magnitude decades 1e-30..1e30, denormal-scale, sparse, axis-aligned,
negated and exactly-proportional pairs, all-zero). A divergence here
(plane derivation, DOUBLE promotion, rounding direction, shift/sign
semantics) would silently shift every candidate set while the
sf-table oracle gate (unit-scale generator vectors) stayed green.

The SQL twin is imported from ``__spark_entry__``
(``_EMB_BUCKETS_CTES``) — the exact CTEs the driver's
embedding_near_dup_pairs oracle runs — so a failure indicts the
function/twin pair, not a test re-implementation.

Knife-edge projections are excluded BY CONSTRUCTION, not tolerance:
the sign test quantizes ROUND(s, 9) >= 0, whose decision boundary
sits at s = -5e-10, and summation-order divergence between engines is
bounded by ~1e-16 x sum(|terms|) — so a row is dropped only when some
projection lies within 1e-13 x sum(|terms|) of that boundary (1000x
the error bound, ground truth via numpy on the same md5 planes).
Everything else — including 1e-30-scale vectors whose projections
round to exactly 0 on every engine — is retained and compared by
exact integer equality.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from __spark_entry__ import _EMB_BUCKETS_CTES, _EMB_LSH_BANDS, _EMB_LSH_BITS
from webscrape_neko_jirushi_spark.operators import similarity

SEED = 20260817
DIM = 64
_SCALES = [1e-30, 1e-300, 1e-12, 1e-6, 1.0, 1e6, 1e12, 1e30]


def _vectors() -> list[list[float]]:
    rng = random.Random(SEED)
    vecs: list[list[float]] = []
    # random dense vectors across magnitude decades (incl. a
    # denormal-adjacent 1e-300 scale: the projection stays normal,
    # the components don't round to zero)
    for scale in _SCALES:
        for _ in range(24):
            vecs.append([rng.uniform(-1, 1) * scale for _ in range(DIM)])
    # sparse: 1-3 nonzero components
    for _ in range(40):
        v = [0.0] * DIM
        for _ in range(rng.randint(1, 3)):
            v[rng.randrange(DIM)] = rng.uniform(-1e6, 1e6)
        vecs.append(v)
    # axis-aligned unit vectors (every dimension's plane column alone)
    for j in range(DIM):
        v = [0.0] * DIM
        v[j] = 1.0
        vecs.append(v)
    # exactly-proportional positive pairs (sign coherence) and
    # negations (every sign bit flips except exact zeros)
    for _ in range(20):
        v = [rng.uniform(-1, 1) for _ in range(DIM)]
        vecs.append(v)
        vecs.append([x * 1024.0 for x in v])   # power-of-two: exact
        vecs.append([-x for x in v])
    # all-zero: projection 0 rounds to 0 >= 0, all bits set
    vecs.append([0.0] * DIM)
    return vecs


@pytest.fixture(scope="module")
def results(spark):
    vecs = _vectors()
    planes = np.array(
        similarity.md5_hyperplanes(DIM, _EMB_LSH_BANDS * _EMB_LSH_BITS)
    )  # (32, 64)
    varr = np.array(vecs)
    proj = varr @ planes.T  # (n, 32)
    # drop knife-edge rows (see module docstring): only projections
    # within 1e-13 x sum(|terms|) of the -5e-10 rounding boundary can
    # legitimately differ between engines
    margin = 1e-13 * (np.abs(varr) @ np.abs(planes.T))
    keep = [
        i
        for i in range(len(vecs))
        if bool(np.all(np.abs(proj[i] + 5e-10) > margin[i]))
    ]
    assert len(keep) > len(vecs) - 5, f"only {len(keep)} of {len(vecs)}"
    vecs = [vecs[i] for i in keep]

    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(v) for v in vecs]}
    )
    sdf = spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>"
    ).coalesce(4)
    got = {
        (int(r["vec_id"]), int(r["band"])): int(r["bucket"])
        for r in similarity.emb_banded(
            sdf, DIM, _EMB_LSH_BANDS, _EMB_LSH_BITS
        ).collect()
    }

    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        (int(v), int(b)): int(k)
        for v, b, k in con.execute(
            f"""
            WITH emb AS (SELECT vec_id, embedding FROM t),
            {_EMB_BUCKETS_CTES}
            SELECT vec_id, band, bucket FROM buckets
            """
        ).fetchall()
    }
    return vecs, got, want


def test_emb_buckets_match_duckdb_cellwise(results):
    vecs, got, want = results
    assert set(got) == set(want)
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, f"{len(bad)} divergent buckets, sample: " + str(
        dict(list(bad.items())[:5])
    )


def test_emb_buckets_fit_the_band_envelope(results):
    _, got, want = results
    for bucket in list(got.values()) + list(want.values()):
        assert 0 <= bucket < (1 << _EMB_LSH_BITS), bucket


def test_proportional_vectors_share_all_buckets(results):
    """The docstring claim behind banded_lsh_candidates' recall
    guarantee: exact positive-scale duplicates land in identical
    buckets in EVERY band (sign bits are scale-invariant away from the
    rounding boundary), so they can never be lost to banding."""
    vecs, got, _ = results
    by_vec: dict[tuple[float, ...], list[int]] = {}
    for i, v in enumerate(vecs):
        n = np.array(v)
        norm = float(np.linalg.norm(n))
        if norm == 0.0:
            continue
        key = tuple(np.round(n / norm, 12))
        buckets = [got[(i, b)] for b in range(_EMB_LSH_BANDS)]
        if key in by_vec:
            assert by_vec[key] == buckets, (i, by_vec[key], buckets)
        else:
            by_vec[key] = buckets
    # the corpus really contains proportional pairs
    assert len(by_vec) < sum(1 for v in vecs if any(v))

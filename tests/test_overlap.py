"""text.overlap: bottom-k (KMV) source-overlap sketches.

Gates: (1) the map-side prune is LOSSLESS (signatures with and
without it are identical, any layout), (2) the estimator tracks exact
Jaccard on planted-overlap corpora within the O(1/sqrt(k)) band,
(3) identical sources estimate 1.0 and disjoint sources 0.0 exactly,
(4) k_eff degrades to the union size on tiny corpora, (5) estimator
is layout-invariant (deterministic sketch, not a random sample).
"""

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.text import overlap as ov


def _docs(spark, specs):
    """specs: list of (source, text). 5-word shingles need >=5 words."""
    return spark.createDataFrame(specs, "source string, text string")


def _planted(spark, shared_n=60, only_a=20, only_b=20, parts=7):
    """Two sources built from disjoint word-atom docs: `shared_n` docs
    in both, plus private docs — exact doc-level control of the
    shingle sets (each doc is 5 unique words = exactly 1 shingle)."""
    rows = []
    for i in range(shared_n):
        t = " ".join(f"sh{i}w{j}" for j in range(5))
        rows += [("a", t), ("b", t)]
    for i in range(only_a):
        rows.append(("a", " ".join(f"oa{i}w{j}" for j in range(5))))
    for i in range(only_b):
        rows.append(("b", " ".join(f"ob{i}w{j}" for j in range(5))))
    return _docs(spark, rows).repartition(parts)


def test_prune_is_lossless(spark):
    d = _planted(spark, 40, 30, 30, parts=5)
    sh = ov.source_shingle_hashes(d)
    k = 16
    with_prune = {
        (r.source, r.h) for r in ov.bottomk_signatures(sh, k=k).collect()
    }
    # unpruned reference: global row_number directly over the distinct set
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.asc("h"))
    ref = {
        (r.source, r.h)
        for r in sh.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
        .collect()
    }
    assert with_prune == ref


def test_estimator_tracks_exact_jaccard(spark):
    d = _planted(spark, 60, 20, 20)  # J = 60 / 100 = 0.6
    sh = ov.source_shingle_hashes(d)
    exact = ov.source_overlap_exact(sh).collect()[0]
    assert exact.jaccard == pytest.approx(0.6)
    est = ov.source_overlap_bottomk(
        ov.bottomk_signatures(sh, k=64), k=64
    ).collect()[0]
    # k=64 over |union|=100: k_eff=64; estimator within ~2/sqrt(k)
    assert est.k_eff == 64
    assert abs(est.est_jaccard - 0.6) < 0.25


def test_identical_and_disjoint_extremes(spark):
    rows = []
    for i in range(30):
        t = " ".join(f"x{i}w{j}" for j in range(5))
        rows += [("p", t), ("q", t)]
    for i in range(30):
        rows.append(("r", " ".join(f"r{i}w{j}" for j in range(5))))
    sh = ov.source_shingle_hashes(_docs(spark, rows).repartition(4))
    got = {
        (r.source_a, r.source_b): (r.est_jaccard, r.k_eff)
        for r in ov.source_overlap_bottomk(
            ov.bottomk_signatures(sh, k=128), k=128
        ).collect()
    }
    assert got[("p", "q")][0] == 1.0
    assert got[("p", "r")][0] == 0.0
    assert got[("q", "r")][0] == 0.0
    # tiny corpus: k_eff is the union size, not k
    assert got[("p", "q")][1] == 30
    assert got[("p", "r")][1] == 60


def test_layout_invariance(spark):
    base = _planted(spark, 50, 25, 25, parts=3)
    sh1 = ov.source_shingle_hashes(base)
    sh2 = ov.source_shingle_hashes(base.repartition(13, "text"))
    r1 = sorted(
        (r.source_a, r.source_b, r.shared_topk, r.k_eff)
        for r in ov.source_overlap_bottomk(
            ov.bottomk_signatures(sh1, k=32), k=32
        ).collect()
    )
    r2 = sorted(
        (r.source_a, r.source_b, r.shared_topk, r.k_eff)
        for r in ov.source_overlap_bottomk(
            ov.bottomk_signatures(sh2, k=32), k=32
        ).collect()
    )
    assert r1 == r2


def test_exact_jaccard_pair_shape(spark):
    d = _planted(spark, 10, 10, 0)  # J = 10/20 = 0.5
    got = ov.source_overlap_exact(ov.source_shingle_hashes(d)).collect()
    assert len(got) == 1
    assert got[0].source_a == "a" and got[0].source_b == "b"
    assert got[0].jaccard == pytest.approx(0.5)

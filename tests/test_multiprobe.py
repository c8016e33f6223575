"""X88 margin-ranked multi-probe LSH: sequence law, equivalence with
the Hamming ball when exhaustive, recall gain on planted clusters,
indexed-path parity, loud bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import similarity as S
from webscrape_neko_jirushi_spark.sources.synth_corpus import (
    synth_clustered_embeddings,
)


def _planes(dim, bits):
    return S._hyperplanes(dim, bits, seed=7)


def _home_bucket(q, planes):
    b = 0
    for i, p in enumerate(planes):
        if S._round_half_up_9(sum(a * x for a, x in zip(q, p))) >= 0:
            b |= 1 << i
    return b


def test_sequence_starts_home_and_is_margin_ranked():
    q = [0.3, -0.2, 0.05, 0.9]
    planes = _planes(4, 6)
    seq = S.multiprobe_sequence(q, planes, n_probes=7)
    assert len(seq) == 7
    assert seq[0] == _home_bucket(q, planes)
    assert len(set(seq)) == 7  # no duplicate buckets
    # flip costs of the emitted sequence are nondecreasing
    projs = [
        S._round_half_up_9(sum(a * x for a, x in zip(q, p))) for p in planes
    ]

    def cost(bucket):
        diff = bucket ^ seq[0]
        return sum(projs[i] ** 2 for i in range(len(planes)) if diff >> i & 1)

    costs = [cost(b) for b in seq]
    assert costs == sorted(costs)


def test_sequence_equals_hamming_ball_when_exhaustive():
    q = [0.1, -0.7, 0.4, 0.2, -0.3]
    planes = _planes(5, 6)
    full = 1 + 6 + 15  # home + C(6,1) + C(6,2)
    seq = S.multiprobe_sequence(
        q, planes, n_probes=full, max_flips=2, margin_pool=6
    )
    ball = S._probe_buckets(q, planes, multiprobe_hamming=2)
    assert set(seq) == set(ball)


def test_zero_margin_flip_cannot_displace_home():
    """A projection that rounds to exactly 0.0 makes its flip cost
    0.0, tying home's score — the home bucket must still be probed
    first (with n_probes=1, ONLY home). The all-zero query vector
    zeroes every projection, the worst case."""
    dim, bits = 4, 6
    planes = _planes(dim, bits)
    q = [0.0] * dim
    home = _home_bucket(q, planes)
    assert S.multiprobe_sequence(q, planes, n_probes=1) == [home]
    seq = S.multiprobe_sequence(q, planes, n_probes=5)
    assert seq[0] == home
    assert len(set(seq)) == 5


def test_n_probes_beyond_bound_raises():
    q = [0.5, 0.5]
    planes = _planes(2, 2)
    with pytest.raises(ValueError) as ei:
        S.multiprobe_sequence(q, planes, n_probes=100)
    assert "n_probes" in str(ei.value)


def test_multiprobe_recall_beats_home_bucket(spark):
    vecs = synth_clustered_embeddings(
        spark, 800, n_clusters=8, dim=32, spread=0.15
    ).cache()
    e = vecs.select("vec_id", "embedding")
    q = [
        float(x)
        for x in e.filter(F.col("vec_id") == 3).head()["embedding"]
    ]
    exact = {r.vec_id for r in S.cosine_topk(e, q, k=10).collect()}

    def recall(n_probes):
        got = {
            r.vec_id
            for r in S.ann_topk_lsh(
                e, q, k=10, bits=16, seed=7, n_probes=n_probes
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r4 = recall(1), recall(4)
    vecs.unpersist()
    # deterministic corpus: at 16 bits the tight cluster splits across
    # buckets on exactly the low-margin planes multiprobe flips first
    assert r1 <= 0.5, f"home-bucket recall unexpectedly high: {r1}"
    assert r4 == 1.0, f"4-probe recall {r4} != 1.0"


def test_multiprobe_indexed_matches_unindexed(spark, tmp_path):
    vecs = synth_clustered_embeddings(
        spark, 400, n_clusters=4, dim=16, spread=0.1
    )
    e = vecs.select("vec_id", "embedding")
    q = [
        float(x)
        for x in e.filter(F.col("vec_id") == 7).head()["embedding"]
    ]
    path = str(tmp_path / "annidx")
    S.build_ann_index(e, path, dim=16, bits=10, seed=7)
    direct = S.ann_topk_lsh(e, q, k=5, bits=10, seed=7, n_probes=6).collect()
    via_idx = S.ann_topk_indexed(spark, path, q, k=5, n_probes=6).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in via_idx]

"""End-to-end multimodal dedup composition: binary media columns ->
deterministic stub embeddings (sources/multimodal.py) -> trained
IVF-PQ index -> probe recovers planted byte-duplicate images.

The decode/encode kernels are the container's deterministic stubs
(md5-seeded — identical bytes give the identical embedding, so exact
byte duplicates are the planted ground truth); everything the index
side does — Lloyd training, residual PQ encode, manifest pinning,
cell-pruned ADC probe — is the real 100-TB path. Swapping the stub
encoder for a real model changes the ground-truth notion (semantic
near-dups instead of byte dups), not one line of this pipeline."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.operators import similarity
from webscrape_neko_jirushi_spark.sources import multimodal

N_UNIQUE = 40
DUP_SRC = 7  # image whose bytes are copied
N_COPIES = 3


def _image_bytes(i: int) -> bytes:
    # deterministic fake "image" payloads, one seed per source image
    return hashlib.sha256(f"img{i}".encode()).digest() * 40  # 1280 B


@pytest.fixture(scope="module")
def media(spark):
    rows = [(f"/imgs/{i:04d}.jpg", _image_bytes(i)) for i in range(N_UNIQUE)]
    rows += [
        (f"/imgs/copy{j}.jpg", _image_bytes(DUP_SRC)) for j in range(N_COPIES)
    ]
    df = spark.createDataFrame(rows, "path string, content binary").cache()
    yield df
    df.unpersist()


def test_image_dedup_via_ivfpq(spark, media, tmp_path):
    emb = multimodal.embed_media(media, dim=64)
    # stable integer ids from the path ordinal (vec_id is the index
    # families' id contract)
    e = emb.withColumn(
        "vec_id", F.xxhash64("path")
    ).select("vec_id", "path", "embedding")

    cents = similarity.ivf_train_centroids(
        e, n_cells=4, n_iters=2, seed=7, dim=64, tol=0.0
    )
    idx = str(tmp_path / "media_ivfpq")
    similarity.build_ivfpq_index(
        e, idx, cents, dim=64, m=8, ksub=16, n_vecs=N_UNIQUE + N_COPIES
    )

    qv = [
        float(x)
        for x in e.filter(F.col("path") == f"/imgs/{DUP_SRC:04d}.jpg")
        .head()["embedding"]
    ]
    top = similarity.ivfpq_topk(spark, idx, qv, k=N_COPIES + 1, nprobe=4)
    rows = top.collect()
    assert len(rows) == N_COPIES + 1

    # the source image and its 3 byte-copies rank first, all at the
    # same (minimal) quantized distance — identical bytes -> identical
    # stub embedding -> identical codes
    got_ids = {r["vec_id"] for r in rows}
    want_paths = [f"/imgs/{DUP_SRC:04d}.jpg"] + [
        f"/imgs/copy{j}.jpg" for j in range(N_COPIES)
    ]
    want_ids = {
        r["vec_id"]
        for r in e.filter(F.col("path").isin(want_paths)).collect()
    }
    assert got_ids == want_ids
    dists = [r["pq_dist"] for r in rows]
    assert max(dists) - min(dists) < 1e-12  # all four are the same point


def test_exact_media_dedup_by_content_hash(spark, media):
    """The cheap first pass a real pipeline runs BEFORE embeddings:
    exact byte dedup on md5(content) — one groupBy, keep-first by
    path. The embedding stage then only sees unique bytes."""
    hashed = media.select("path", F.md5("content").alias("h"))
    groups = (
        hashed.groupBy("h")
        .agg(F.count("*").alias("n"), F.min("path").alias("keeper"))
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(groups) == 1
    g = groups[0]
    assert g["n"] == N_COPIES + 1
    assert g["keeper"] == f"/imgs/{DUP_SRC:04d}.jpg"

"""Multimodal plumbing: binary columns through mapInPandas probes.

The decode kernels are deterministic fakes in this container (no
PIL/ffmpeg); the Spark surface — schemas, Arrow batching, fan-out —
is the real thing being pinned here.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.sources.multimodal import (
    content_stats,
    embed_media,
    fake_decode,
    probe_images,
    sample_frames,
)


def _binary_df(spark, n=20):
    rows = [
        (f"/data/img_{i}.jpg", hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1))
        for i in range(n)
    ]
    rows.append(("/data/corrupt.jpg", b""))
    return spark.createDataFrame(rows, "path string, content binary")


def test_probe_images_schema_and_determinism(spark):
    df = _binary_df(spark)
    out = probe_images(df, use_real=False)
    rows = {r["path"]: r for r in out.collect()}
    assert len(rows) == 21
    # corrupt file -> valid=False, nulls (P19 path)
    assert rows["/data/corrupt.jpg"]["valid"] is False
    assert rows["/data/corrupt.jpg"]["width"] is None
    # deterministic: same bytes -> same probe
    again = {r["path"]: r for r in probe_images(df, use_real=False).collect()}
    for p in rows:
        assert rows[p] == again[p]
    ok = rows["/data/img_3.jpg"]
    assert ok["valid"] and 50 <= ok["width"] <= 1550 and ok["size_bytes"] > 0
    # matches the pure kernel
    content = hashlib.sha256(b"3").digest() * 4
    assert ok["width"] == fake_decode(content)["width"]


def test_content_stats_ranges(spark):
    out = content_stats(_binary_df(spark)).collect()
    by_path = {r["path"]: r for r in out}
    assert by_path["/data/corrupt.jpg"]["top_color_ratio"] is None
    for r in out:
        if r["top_color_ratio"] is not None:
            assert 0.0 < r["top_color_ratio"] <= 1.0
            assert 0.0 <= r["warm_ratio"] <= 1.0


def test_sample_frames_fanout(spark):
    df = spark.createDataFrame(
        [("/v/a.mp4", b"x" * 100_000), ("/v/b.mp4", b"y" * 2048), ("/v/nil.mp4", b"")],
        "path string, content binary",
    )
    out = sample_frames(df, every_n=30).collect()
    by_path = {}
    for r in out:
        by_path.setdefault(r["path"], []).append(r["frame_idx"])
    assert len(by_path["/v/a.mp4"]) == len(range(0, 97, 30))
    assert by_path["/v/b.mp4"] == [0]
    assert "/v/nil.mp4" not in by_path  # undecodable -> no frames


def test_embed_media_unit_norm(spark):
    out = embed_media(_binary_df(spark, 5), dim=16).collect()
    import numpy as np

    for r in out:
        if r["embedding"] is not None:
            v = np.array(r["embedding"])
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
            assert len(v) == 16

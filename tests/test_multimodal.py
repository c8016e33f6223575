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


def test_resize_images_bounded_box_and_passthrough(spark):
    from webscrape_neko_jirushi_spark.sources import multimodal

    rows = [(f"/m/{i}.jpg", hashlib.sha256(str(i).encode()).digest() * 8)
            for i in range(30)]
    rows.append(("/m/corrupt.jpg", b""))
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in multimodal.resize_images(df, max_side=1024).collect()}
    assert len(out) == 31
    assert out["/m/corrupt.jpg"]["valid"] is False
    assert out["/m/corrupt.jpg"]["content"] is None
    saw_resize = saw_pass = False
    for path, content in rows[:-1]:
        meta = multimodal.fake_decode(content)
        r = out[path]
        assert r["valid"] is True
        assert max(r["width"], r["height"]) <= 1024
        if max(meta["width"], meta["height"]) <= 1024:
            saw_pass = True  # pass-through: bytes untouched
            assert bytes(r["content"]) == content
            assert (r["width"], r["height"]) == (meta["width"], meta["height"])
        else:
            saw_resize = True  # aspect preserved within integer floor
            assert bytes(r["content"]).startswith(b"resized:")
            ar_in = meta["width"] / meta["height"]
            ar_out = r["width"] / r["height"]
            assert abs(ar_in - ar_out) / ar_in < 0.05
    assert saw_resize and saw_pass  # the md5-dim corpus hits both paths


def test_probe_audio_metadata_and_corrupt(spark):
    from webscrape_neko_jirushi_spark.sources import multimodal

    rows = [(f"/a/{i}.wav", hashlib.sha256(f"a{i}".encode()).digest() * (100 + i))
            for i in range(10)]
    rows.append(("/a/corrupt.wav", b""))
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in multimodal.probe_audio(df).collect()}
    assert out["/a/corrupt.wav"]["valid"] is False
    for path, content in rows[:-1]:
        r = out[path]
        assert r["valid"] is True
        assert r["sample_rate"] in (8000, 16000, 22050, 44100, 48000)
        assert r["channels"] in (1, 2)
        want = round(len(content) / (r["sample_rate"] * 2.0 * r["channels"]), 6)
        assert abs(r["duration_sec"] - want) < 1e-9
    # deterministic across partitioning
    again = {r["path"]: r["duration_sec"]
             for r in multimodal.probe_audio(df.repartition(5)).collect()}
    assert again == {p: r["duration_sec"] for p, r in out.items()}

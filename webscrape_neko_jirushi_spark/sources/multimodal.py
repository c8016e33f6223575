"""Multimodal (image/audio/video) column operators.

The reference handles media as files on disk probed with PIL
(advanced_cleaning.py:96-126) and YOLO (yolo_cat_detector.py:87-130).
Here media are opaque ``binary`` columns with typed metadata; each
operator is an Arrow-batched ``mapInPandas`` with a REAL Spark surface
(schema, batching, partitioning) and a decode kernel that is:

- a deterministic fake (``fake_decode``) in this container (no PIL/
  ffmpeg available), used by tests to pin the plumbing; or
- the real library, if importable, behind the same interface.

Swap-in points are marked; the pipeline shape (binaryFile scan ->
probe -> filter cascade -> feature UDF) is what runs at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the real decoder, if the image stack exists
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

PROBE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("alpha_max", T.IntegerType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def fake_decode(content: bytes) -> dict:
    """Deterministic stand-in for PIL decode: attributes are a pure
    function of the byte content (md5-derived), so tests are stable.
    Empty/None content models a corrupt file (PIL.verify() throw,
    cleanup_dataset.py:66-73)."""
    if not content:
        return {"width": None, "height": None, "mode": None, "alpha_max": None, "valid": False}
    h = hashlib.md5(content).digest()
    width = 50 + int.from_bytes(h[0:2], "big") % 1500
    height = 50 + int.from_bytes(h[2:4], "big") % 1500
    mode = "RGBA" if h[4] % 5 == 0 else "RGB"
    alpha_max = 30 if (mode == "RGBA" and h[5] % 2 == 0) else 255
    return {"width": width, "height": height, "mode": mode, "alpha_max": alpha_max, "valid": True}


def real_decode(content: bytes) -> dict:
    """PIL-backed probe (advanced_cleaning.py:96-126 semantics)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "PIL not available in this container; use fake_decode (the "
            "Spark plumbing is identical)"
        )
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(content)) as img:
            width, height = img.size
            alpha_max = None
            if img.mode == "RGBA":
                alpha_max = img.split()[-1].getextrema()[1]
            return {
                "width": width, "height": height, "mode": img.mode,
                "alpha_max": alpha_max, "valid": True,
            }
    except Exception:  # noqa: BLE001 — decode failure is data, not error
        return {"width": None, "height": None, "mode": None, "alpha_max": None, "valid": False}


def probe_images(binary_files: DataFrame, use_real: bool | None = None) -> DataFrame:
    """F4: bytes -> (width, height, mode, alpha_max, valid) metadata.

    Input: ``spark.read.format('binaryFile')`` rows (path, content, ...).
    One Arrow batch in, one out; the decoder runs per value inside the
    batch (numpy/PIL), never per Spark row boundary.
    """
    decode = real_decode if (use_real if use_real is not None else HAVE_PIL) else fake_decode

    def _probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode(c) for c in pdf["content"]]
            out = pd.DataFrame(metas)
            out.insert(0, "path", pdf["path"].to_numpy())
            out.insert(1, "size_bytes", [len(c) if c is not None else 0 for c in pdf["content"]])
            yield out[[f.name for f in PROBE_SCHEMA.fields]]

    return binary_files.select("path", "content").mapInPandas(_probe, PROBE_SCHEMA)


CONTENT_STATS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("top_color_ratio", T.DoubleType()),
        T.StructField("warm_ratio", T.DoubleType()),
    ]
)


def content_stats(binary_files: DataFrame) -> DataFrame:
    """F5: uniform-color ratio (aggressive_cleaning.py:119-136) + warm
    ratio (cleanup_dataset.py:102-122). With no image stack the pixel
    grid is the deterministic fake (seeded from bytes); the numpy
    bincount kernel is the real one either way."""

    def _stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            tops, warms = [], []
            for c in pdf["content"]:
                if not c:
                    tops.append(None)
                    warms.append(None)
                    continue
                # fake pixel grid: 50x50 RGB from a seeded generator
                # (swap for PIL img.resize((50,50)) when available)
                seed = int.from_bytes(hashlib.md5(c).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                px = rng.integers(0, 256, size=(2500, 3), dtype=np.int64)
                if seed % 7 == 0:  # planted logo-like uniform image
                    px[: int(2500 * 0.9)] = px[0]
                packed = px[:, 0] * 65536 + px[:, 1] * 256 + px[:, 2]
                _, counts = np.unique(packed, return_counts=True)
                tops.append(counts.max() / 2500.0)
                warm = (
                    (px[:, 0] > px[:, 1]) & (px[:, 0] > px[:, 2]) & (px[:, 0] > 100)
                ).sum()
                warms.append(warm / 2500.0)
            yield pd.DataFrame(
                {"path": pdf["path"], "top_color_ratio": tops, "warm_ratio": warms}
            )

    return binary_files.select("path", "content").mapInPandas(
        _stats, CONTENT_STATS_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(binary_videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling (UDTF shape: one row in, k frames out).
    Decode is stubbed (no ffmpeg in this container): frames are
    deterministic byte slices standing in for decoded frames — the
    explode/fan-out plumbing, schema, and batch shape are real."""

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, idxs, frames = [], [], []
            for path, c in zip(pdf["path"], pdf["content"]):
                if not c:
                    continue
                n_frames = max(1, len(c) // 1024)
                for i in range(0, n_frames, every_n):
                    paths.append(path)
                    idxs.append(i)
                    frames.append(bytes(c[i * 1024 : i * 1024 + 64]))
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame": frames})

    return binary_videos.select("path", "content").mapInPandas(_frames, FRAME_SCHEMA)


def embed_media(binary_files: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction stub: bytes -> unit-norm embedding
    array<float>. Deterministic (md5-seeded gaussian) so similarity
    tests are stable; swap the kernel for a real encoder on a cluster
    with the model available (per-executor singleton, F7 pattern)."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def _embed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # swap-in point: load the real encoder ONCE per worker here
        for pdf in it:
            embs = []
            for c in pdf["content"]:
                if not c:
                    embs.append(None)
                    continue
                seed = int.from_bytes(hashlib.md5(c).digest()[:8], "big")
                v = np.random.default_rng(seed).standard_normal(dim)
                embs.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame({"path": pdf["path"], "embedding": embs})

    return binary_files.select("path", "content").mapInPandas(_embed, out_schema)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S9: directory scan as the binaryFile source with pushed-down
    path glob (replaces iterdir/glob loops, advanced_cleaning.py:151-160)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .withColumn("ext", F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)\z", 1)))
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def resize_images(
    binary_files: DataFrame, max_side: int = 512
) -> DataFrame:
    """Bounded-box resize (the training-prep normalization step:
    nothing enters the dataset above ``max_side`` on its longer
    edge). Aspect-preserving target dims come from the probe
    metadata; the pixel kernel is the container stub — output bytes
    are a deterministic function of (input bytes, target dims), and a
    no-op pass-through when the image already fits (real resizers
    must also skip: re-encoding an untouched image costs quality AND
    a full-corpus write). Swap ``_resize_kernel`` for PIL
    ``Image.thumbnail`` + re-encode on a cluster; the plumbing —
    Arrow batches, schema, the skip path — is what runs at 100 TB.
    Corrupt inputs pass through with ``valid=False`` (data, not an
    error — the cascade filters them)."""

    def _resize_kernel(content: bytes, w: int, h: int) -> bytes:
        # swap-in point: PIL decode -> thumbnail((w, h)) -> re-encode
        tag = f"resized:{w}x{h}:".encode()
        return tag + hashlib.md5(content).digest()

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, ws, hs, outs, valids = [], [], [], [], []
            for path, c in zip(pdf["path"], pdf["content"]):
                meta = fake_decode(None if c is None else bytes(c))
                paths.append(path)
                if not meta["valid"]:
                    ws.append(None); hs.append(None)
                    outs.append(None); valids.append(False)
                    continue
                w, h = meta["width"], meta["height"]
                long_side = max(w, h)
                if long_side <= max_side:  # already fits: pass through
                    ws.append(w); hs.append(h)
                    outs.append(bytes(c)); valids.append(True)
                    continue
                scale = max_side / long_side
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
                ws.append(nw); hs.append(nh)
                outs.append(_resize_kernel(bytes(c), nw, nh))
                valids.append(True)
            yield pd.DataFrame(
                {"path": paths, "width": ws, "height": hs,
                 "content": outs, "valid": valids}
            )

    return binary_files.select("path", "content").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def probe_audio(binary_files: DataFrame) -> DataFrame:
    """Audio metadata probe — the audio member of the media triad
    (image probe / video frame-sample / audio probe), the admission
    gate a speech pipeline runs before feature extraction (drop
    sub-second clips, resample targets, mono/stereo routing).
    Deterministic stub kernel (no ffmpeg/soundfile in this
    container): attributes are a pure function of the bytes; swap for
    ``soundfile.info``/ffprobe on a cluster. Corrupt input ->
    ``valid=False`` row, never an exception."""

    def _probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path, c in zip(pdf["path"], pdf["content"]):
                if not c:
                    rows.append((path, None, None, None, False))
                    continue
                h = hashlib.md5(bytes(c)).digest()
                sr = (8000, 16000, 22050, 44100, 48000)[h[0] % 5]
                channels = 1 + h[1] % 2
                # duration scales with payload size (a real container
                # header would carry it): bytes / (sr * 2 * channels)
                duration = round(len(c) / (sr * 2.0 * channels), 6)
                rows.append((path, duration, sr, channels, True))
            yield pd.DataFrame(
                rows,
                columns=["path", "duration_sec", "sample_rate",
                         "channels", "valid"],
            )

    return binary_files.select("path", "content").mapInPandas(
        _probe, AUDIO_SCHEMA
    )

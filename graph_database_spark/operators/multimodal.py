"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media are opaque `binary` columns with a typed metadata struct — the
columnar answer to blob storage in a training-data pipeline. Decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators. IMAGES have a REAL codec: binary PPM (P6)
decode/encode and nearest-neighbor resample in pure numpy (no external
libraries), so `extract_features(codec="real")` and `resize_images`
run actual pixel math end-to-end. Audio/video decoding remains the
integration point for external codecs (NotImplementedError in this
container); the default deterministic fake path hashes bytes into
reproducible features so downstream operators (dedup, ANN) can be
exercised end-to-end on any media type.

Scale notes: binary payloads ride in the same parquet row-groups as the
metadata, so partition sizing must budget for payload width —
`spark.sql.files.maxPartitionBytes` governs scan parallelism; mapInPandas
streams Arrow record batches, so executor memory is bounded by batch size
(spark.sql.execution.arrow.maxRecordsPerBatch), not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_META = StructType([
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("format", StringType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),  # image|audio|video
    StructField("content", BinaryType(), False),
    StructField("meta", MEDIA_META),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("feature", ArrayType(FloatType()), False),
])

FRAMES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("ts_ms", IntegerType(), False),
])


def synth_media(spark: SparkSession, n: int = 64,
                num_partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for exercising the plumbing."""
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        mt = types[i % 3]
        content = hashlib.sha256(f"media-{i}".encode()).digest() * 8
        meta = (256, 256, None, None, "png") if mt == "image" else \
               (None, None, 16000, 5000, "wav") if mt == "audio" else \
               (640, 360, None, 10000, "mp4")
        rows.append((i, mt, bytearray(content), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(num_partitions)


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Reproducible pseudo-embedding: sha256-seeded uniform vector, L2-norm."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:4], "big")
    v = np.random.RandomState(seed).normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


# ---------------------------------------------------------------------------
# Real codec: binary PPM (P6) in pure numpy — no external image libraries.
# PPM is the simplest real raster format (netpbm); supporting it de-stubs
# the codec="real" path end-to-end: header parse → pixel decode → actual
# resample → re-encode, all vectorized.
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 array → binary PPM (P6) bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {img.shape}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (H, W, 3) uint8 array. Handles arbitrary
    header whitespace and '#' comment lines per the netpbm spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic + width + height + maxval tokens, then ONE whitespace
    # byte, then raw pixels; comments run '#'..newline anywhere in between
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte separating header from pixels
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, 3).copy()


def _resample_nn(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample via numpy index arrays (no loops)."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return img[ys[:, None], xs[None, :]]


def _ppm_feature(content: bytes, dim: int) -> np.ndarray:
    """Real image feature: decode PPM, grayscale (ITU-R 601 luma), mean
    over a g×g grid (g = √dim), scale to [0,1], L2-normalize — the
    classic tiny-thumbnail embedding, exact and deterministic."""
    g = int(round(dim ** 0.5))
    if g * g != dim:
        raise ValueError(f"codec='real' needs a square dim, got {dim}")
    img = decode_ppm(content).astype(np.float64)
    luma = img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    cells = _resample_mean_grid(luma, g)
    v = (cells / 255.0).reshape(dim).astype(np.float32)
    nrm = float(np.linalg.norm(v))
    return v / nrm if nrm > 0 else v


def _resample_mean_grid(gray: np.ndarray, g: int) -> np.ndarray:
    """(H, W) → (g, g) of cell means, cells = equal index splits."""
    h, w = gray.shape
    ye = np.linspace(0, h, g + 1).astype(np.int64)
    xe = np.linspace(0, w, g + 1).astype(np.int64)
    out = np.empty((g, g), dtype=np.float64)
    for i in range(g):
        for j in range(g):
            out[i, j] = gray[ye[i]:ye[i + 1], xe[j]:xe[j + 1]].mean()
    return out


def extract_features(media: DataFrame, dim: int = 16,
                     codec: str = "fake") -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas.

    codec="real" decodes IMAGE rows with the pure-numpy PPM (P6) codec
    above and emits grid-luma thumbnail embeddings; audio/video remain
    the integration point for external codecs (NotImplementedError —
    not available in this container). codec="fake" hashes bytes into
    reproducible pseudo-embeddings for any media type.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                bad = [t for t in pdf["media_type"].unique() if t != "image"]
                if bad:
                    raise NotImplementedError(
                        f"real decoding of {bad} requires audio/video "
                        f"codecs not present in this environment; filter "
                        f"to media_type='image' or use codec='fake'")
                feats = [
                    _ppm_feature(bytes(c), dim).tolist()
                    for c in pdf["content"]
                ]
            else:
                feats = [
                    _fake_feature(bytes(c), dim).tolist()
                    for c in pdf["content"]
                ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
            })

    return media.mapInPandas(featurize, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 224) -> DataFrame:
    """ACTUAL pixel resize of PPM image rows (aspect-preserving,
    nearest-neighbor, pure numpy) — the executed form of `resize_plan`:
    decode → resample → re-encode inside one Arrow-batched mapInPandas,
    returning the media schema with new content and updated meta dims.
    Non-image rows pass through untouched."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for mt, c, meta in zip(pdf["media_type"], pdf["content"],
                                   pdf["meta"]):
                if mt != "image":
                    contents.append(c)
                    metas.append(meta)
                    continue
                img = decode_ppm(bytes(c))
                h, w = img.shape[:2]
                scale = min(max_side / w, max_side / h, 1.0)
                tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                out = _resample_nn(img, tw, th)
                contents.append(bytearray(encode_ppm(out)))
                meta = dict(meta)
                meta["width"], meta["height"] = tw, th
                meta["format"] = "ppm"
                metas.append(meta)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "content": contents,
                "meta": metas,
            })

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)


def synth_ppm_media(spark: SparkSession, n: int = 16,
                    width: int = 32, height: int = 24,
                    num_partitions: int = 4) -> DataFrame:
    """Deterministic REAL image table: per id a gradient-plus-id-stripe
    PPM payload, so decode/resize/featurize are exercised on actual
    pixels without external libraries."""
    rows = []
    for i in range(n):
        y, x = np.mgrid[0:height, 0:width]
        img = np.stack([
            (x * 255 // max(width - 1, 1)),
            (y * 255 // max(height - 1, 1)),
            np.full_like(x, (i * 37) % 256),
        ], axis=2).astype(np.uint8)
        rows.append((i, "image", bytearray(encode_ppm(img)),
                     (width, height, None, None, "ppm")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(num_partitions)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame, computed from
    duration metadata (JVM-side sequence — the decode of actual frames is
    the stubbed codec step)."""
    video = media.filter(F.col("media_type") == "video")
    idx = F.explode(F.sequence(
        F.lit(0), F.floor(F.col("meta.duration_ms") / every_ms).cast("int")))
    return (video
            .select("media_id", idx.alias("frame_index"))
            .withColumn("ts_ms", F.col("frame_index") * every_ms)
            .select("media_id", "frame_index", "ts_ms"))


def resize_plan(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning (target dims from metadata, aspect-preserving);
    the pixel transform itself is the stubbed codec step."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return (media.filter(w.isNotNull() & h.isNotNull())
            .select("media_id", "media_type",
                    F.round(w * scale).cast("int").alias("target_width"),
                    F.round(h * scale).cast("int").alias("target_height")))

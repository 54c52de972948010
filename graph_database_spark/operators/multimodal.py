"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media are opaque `binary` columns with a typed metadata struct — the
columnar answer to blob storage in a training-data pipeline. Decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators: the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested; the actual codec step is
STUBBED because image/audio libraries are not in this container —
`decode_media(..., codec="real")` raises NotImplementedError, while the
default deterministic fake path hashes bytes into reproducible features
so downstream operators (dedup, ANN) can be exercised end-to-end.

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


def extract_features(media: DataFrame, dim: int = 16,
                     codec: str = "fake") -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas.

    codec="real" is the integration point for actual image/audio libs —
    NotImplementedError here, by design (not available in this container).
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decoding requires image/audio codecs not "
                    "present in this environment; use codec='fake'")
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

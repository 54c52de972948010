"""Multimodal column plumbing: schema, Arrow batch shape, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_spark.operators.multimodal import (
    FEATURES_SCHEMA, extract_features, frame_sample, resize_plan, synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=48, num_partitions=4).cache()


def test_extract_features_schema_and_determinism(media):
    f1 = extract_features(media, dim=16)
    assert f1.schema == FEATURES_SCHEMA
    rows1 = {r["media_id"]: r["feature"] for r in f1.collect()}
    rows2 = {r["media_id"]: r["feature"]
             for r in extract_features(media, dim=16).collect()}
    assert rows1 == rows2
    assert len(rows1) == 48
    assert all(len(v) == 16 for v in rows1.values())


def test_real_codec_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        extract_features(media, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_frame_sample(media):
    frames = frame_sample(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    # videos are 10s → 11 sampled frames (0..10 inclusive)
    assert got and all(r["count"] == 11 for r in got)
    ts = frames.filter(F.col("media_id") == got[0]["media_id"]) \
        .orderBy("frame_index").collect()
    assert [r["ts_ms"] for r in ts][:3] == [0, 1000, 2000]


def test_resize_plan(media):
    plans = resize_plan(media, max_side=224).collect()
    assert plans
    for r in plans:
        assert max(r["target_width"], r["target_height"]) <= 224

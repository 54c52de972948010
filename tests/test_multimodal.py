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


def test_real_codec_audio_video_still_stubbed(media):
    """Audio/video decode remains the external-codec integration point."""
    with pytest.raises(Exception) as ei:
        extract_features(media.filter(F.col("media_type") != "image"),
                         codec="real").collect()
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


def test_ppm_roundtrip_and_header_comments():
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_ppm, encode_ppm,
    )
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # netpbm allows comments + arbitrary whitespace inside the header
    raw = (b"P6 # magic\n# a comment line\n 7 \n# another\n5\n255\n"
           + img.tobytes())
    assert (decode_ppm(raw) == img).all()


def test_real_codec_features_match_numpy(spark):
    """codec='real' must equal the straightforward numpy computation:
    PPM decode -> luma -> 4x4 grid means -> /255 -> L2 norm."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_ppm, extract_features, synth_ppm_media,
    )
    media = synth_ppm_media(spark, n=6, width=32, height=24)
    got = {r["media_id"]: np.array(r["feature"])
           for r in extract_features(media, dim=16, codec="real").collect()}
    assert len(got) == 6
    for r in media.collect():
        img = decode_ppm(bytes(r["content"])).astype(np.float64)
        luma = img @ np.array([0.299, 0.587, 0.114])
        cells = np.array([
            luma[i * 6:(i + 1) * 6, j * 8:(j + 1) * 8].mean()
            for i in range(4) for j in range(4)])
        exp = (cells / 255.0).astype(np.float32)
        exp = exp / np.linalg.norm(exp)
        assert np.allclose(got[r["media_id"]], exp, atol=1e-6)


def test_resize_images_actual_pixels(spark):
    """resize_images must change the payload: decoded dims equal the
    aspect-preserving targets and pixels equal the nearest-neighbor
    resample of the original."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_ppm, resize_images, synth_ppm_media,
    )
    media = synth_ppm_media(spark, n=4, width=32, height=24)
    orig = {r["media_id"]: decode_ppm(bytes(r["content"]))
            for r in media.collect()}
    out = resize_images(media, max_side=8).collect()
    assert len(out) == 4
    for r in out:
        assert (r["meta"]["width"], r["meta"]["height"]) == (8, 6)
        img = decode_ppm(bytes(r["content"]))
        assert img.shape == (6, 8, 3)
        src = orig[r["media_id"]]
        ys = np.minimum(((np.arange(6) + 0.5) * 24 / 6).astype(int), 23)
        xs = np.minimum(((np.arange(8) + 0.5) * 32 / 8).astype(int), 31)
        assert (img == src[ys[:, None], xs[None, :]]).all()

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


def test_real_codec_rejects_compressed_payloads(media):
    """All three modalities now have real pure-numpy baseline codecs;
    compressed payloads (synth_media fakes claim mp4) must fail loudly
    at the decoder, not produce garbage features."""
    with pytest.raises(Exception) as ei:
        extract_features(media.filter(F.col("media_type") == "video"),
                         codec="real").collect()
    assert "YUV4MPEG2" in str(ei.value)


def test_y4m_roundtrip_c444_and_c420():
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_y4m, encode_y4m,
    )
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(3, 6, 8, 3), dtype=np.uint8)
    # C444: lossless up to the ±2 YCbCr round-trip rounding
    out, fn, fd = decode_y4m(encode_y4m(frames, fps_num=30, colorspace="C444"))
    assert (fn, fd) == (30, 1) and out.shape == frames.shape
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 2
    # C420: luma survives subsampling exactly (Y plane is never averaged)
    gray = np.repeat(rng.randint(0, 256, size=(2, 4, 6, 1), dtype=np.uint8),
                     3, axis=3)
    out2, _, _ = decode_y4m(encode_y4m(gray, fps_num=10))
    assert np.abs(out2.astype(int) - gray.astype(int)).max() <= 3
    # unknown header tags (Xcomment) and FRAME params are skipped
    raw = encode_y4m(frames, colorspace="C444")
    patched = raw.replace(b" Ip ", b" Ip Xskipme ", 1) \
                 .replace(b"FRAME\n", b"FRAME Ixyz\n", 1)
    out3, _, _ = decode_y4m(patched)
    assert (out3 == out).all()


def test_real_codec_video_features_match_numpy(spark):
    """codec='real' on video must equal the plain-numpy computation:
    Y4M decode -> per-frame luma -> time mean -> 4x4 grid -> /255 -> L2."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_y4m, extract_features, synth_y4m_media,
    )
    media = synth_y4m_media(spark, n=4, width=32, height=24, num_frames=6)
    got = {r["media_id"]: np.array(r["feature"])
           for r in extract_features(media, dim=16, codec="real").collect()}
    assert len(got) == 4
    for r in media.collect():
        frames, _, _ = decode_y4m(bytes(r["content"]))
        luma = (frames.astype(np.float64)
                @ np.array([0.299, 0.587, 0.114])).mean(axis=0)
        cells = np.array([
            luma[i * 6:(i + 1) * 6, j * 8:(j + 1) * 8].mean()
            for i in range(4) for j in range(4)])
        exp = (cells / 255.0).astype(np.float32)
        exp = exp / np.linalg.norm(exp)
        assert np.allclose(got[r["media_id"]], exp, atol=1e-6)


def test_real_codec_all_three_modalities_one_pass(spark):
    """One mapInPandas pass must featurize image, audio, and video rows
    together with a single dim."""
    from graph_database_spark.operators.multimodal import (
        synth_ppm_media, synth_wav_media, synth_y4m_media,
    )
    mixed = (synth_ppm_media(spark, n=2)
             .unionByName(synth_wav_media(spark, n=2))
             .unionByName(synth_y4m_media(spark, n=2)))
    rows = extract_features(mixed, dim=16, codec="real").collect()
    assert len(rows) == 6
    assert {r["media_type"] for r in rows} == {"image", "audio", "video"}
    assert all(len(r["feature"]) == 16 for r in rows)


def test_extract_frames_real_stills(spark):
    """extract_frames must emit decodable PPM stills whose pixels equal
    the decoded Y4M frame at each sampled timestamp."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_ppm, decode_y4m, extract_frames, synth_y4m_media,
    )
    # 10 frames @ 10 fps = 1000 ms → ticks at 0/250/500/750 ms
    media = synth_y4m_media(spark, n=2, num_frames=10, fps=10)
    src = {r["media_id"]: decode_y4m(bytes(r["content"]))[0]
           for r in media.collect()}
    out = extract_frames(media, every_ms=250).collect()
    assert len(out) == 2 * 4
    for r in out:
        assert r["frame_index"] == r["ts_ms"] // 100  # 10 fps → 100 ms/frame
        img = decode_ppm(bytes(r["content"]))
        assert (img == src[r["media_id"]][r["frame_index"]]).all()
        assert np.any(img == 255)  # the moving stripe is present


def test_motion_profile_moving_vs_static(spark):
    """The synth stripe moves every frame → every transition has nonzero
    motion; a static clip (same frame repeated) must profile ~0 — the
    contract a static-clip filter in a curation pipeline thresholds on."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_y4m, motion_profile, synth_y4m_media,
    )
    moving = synth_y4m_media(spark, n=3, num_frames=8)
    rows = motion_profile(moving).collect()
    assert len(rows) == 3 * 7
    assert all(r["motion"] > 0 for r in rows)
    frame = np.full((10, 8, 3), 77, dtype=np.uint8)
    static = spark.createDataFrame(
        [(99, "video", bytearray(encode_y4m(np.stack([frame] * 5))),
          (8, 10, None, 500, "y4m"))], MEDIA_SCHEMA)
    srows = motion_profile(static).collect()
    assert len(srows) == 4
    assert all(r["motion"] == 0.0 for r in srows)


def test_wav_roundtrip_and_chunk_tolerance():
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_wav, encode_wav,
    )
    rng = np.random.RandomState(7)
    stereo = rng.randint(-32768, 32768, size=(100, 2), dtype=np.int16)
    out, sr = decode_wav(encode_wav(stereo, 44100))
    assert sr == 44100 and (out == stereo).all()
    mono = rng.randint(-32768, 32768, size=33, dtype=np.int16)
    raw = encode_wav(mono, 8000)
    # real encoders interleave extra chunks (LIST/INFO, odd-size + pad);
    # the parser must walk past them
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    patched = raw[:12] + extra + raw[12:]
    out2, sr2 = decode_wav(patched)
    assert sr2 == 8000 and (out2[:, 0] == mono).all()


def test_wav_decoder_rejects_malformed_payloads():
    """A lying chunk size must raise, never silently truncate samples;
    a zero-channel fmt must be a ValueError, not ZeroDivisionError."""
    import numpy as np
    import pytest

    from graph_database_spark.operators.multimodal import (
        decode_wav, encode_wav,
    )
    mono = np.arange(40, dtype=np.int16)
    raw = bytearray(encode_wav(mono, 8000))
    data_pos = raw.index(b"data")
    # inflate the declared data-chunk size past the real payload
    raw[data_pos + 4:data_pos + 8] = (10 ** 6).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(bytes(raw))
    raw2 = bytearray(encode_wav(mono, 8000))
    fmt_pos = raw2.index(b"fmt ")
    raw2[fmt_pos + 10:fmt_pos + 12] = (0).to_bytes(2, "little")  # ch=0
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav(bytes(raw2))


def test_real_codec_audio_features_match_numpy(spark):
    """codec='real' on audio must equal the plain-numpy computation:
    WAV decode -> mono [-1,1] -> 8 segment RMS + 8 spectral bands -> L2."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_wav, extract_features, synth_wav_media,
    )
    media = synth_wav_media(spark, n=6, sample_rate=8000, duration_ms=250)
    got = {r["media_id"]: np.array(r["feature"])
           for r in extract_features(media, dim=16, codec="real").collect()}
    assert len(got) == 6
    for r in media.collect():
        samples, _ = decode_wav(bytes(r["content"]))
        mono = samples.astype(np.float64).mean(axis=1) / 32768.0
        seg = np.array_split(mono, 8)
        rms = np.array([np.sqrt((s ** 2).mean()) for s in seg])
        spec = np.abs(np.fft.rfft(mono))[1:]
        bands = np.array([b.mean() for b in np.array_split(spec, 8)])
        exp = np.concatenate([rms, bands]).astype(np.float32)
        exp = exp / np.linalg.norm(exp)
        assert np.allclose(got[r["media_id"]], exp, atol=1e-5)


def test_real_codec_mixed_image_audio(spark):
    """One mapInPandas pass must handle image and audio rows together."""
    from graph_database_spark.operators.multimodal import (
        synth_ppm_media, synth_wav_media,
    )
    mixed = synth_ppm_media(spark, n=3).unionByName(
        synth_wav_media(spark, n=3))
    rows = extract_features(mixed, dim=16, codec="real").collect()
    assert len(rows) == 6
    assert {r["media_type"] for r in rows} == {"image", "audio"}
    assert all(len(r["feature"]) == 16 for r in rows)


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


def test_format_detect_routes_real_payloads(spark):
    """Magic-byte routing: payloads produced by the REAL in-engine
    encoders classify as their format with route=in_engine; compressed
    magic (JPEG/PNG/MP4) routes external; the external-routed rows are
    exactly the ones the real decoder would reject — the production
    seam contract."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        decode_ppm, detect_media_format, encode_ppm, encode_wav,
        encode_y4m,
    )
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    frames = rng.randint(16, 236, size=(2, 4, 4, 3), dtype=np.uint8)
    payloads = {
        1: (encode_ppm(img), "ppm", "in_engine"),
        2: (encode_wav(np.zeros(8, dtype=np.int16), 8000), "wav",
            "in_engine"),
        3: (encode_y4m(frames), "y4m", "in_engine"),
        4: (b"\xff\xd8\xff\xe0\x00\x10JFIF-rest", "jpeg", "external"),
        5: (b"\x89PNG\r\n\x1a\n-rest", "png", "external"),
        6: (b"\x00\x00\x00\x18ftypisom-rest", "mp4", "external"),
        7: (b"RIFF\x10\x00\x00\x00AVI -rest", "avi", "external"),
        8: (b"RIFF\x10\x00\x00\x00JUNK-rest", "riff-unknown", "external"),
        # free-floating WAVE at offset 9 without RIFF must NOT match
        9: (b"xxxxxxxxWAVE-rest", "unknown", "external"),
    }
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, (p, _f, _r) in payloads.items()],
        "media_id int, content binary")
    got = {r["media_id"]: (r["format"], r["route"])
           for r in detect_media_format(df).collect()}
    for k, (_p, fmt, route) in payloads.items():
        assert got[k] == (fmt, route), (k, got[k], fmt, route)
    # seam contract: in-engine PPM payload round-trips; the jpeg payload
    # (routed external) is exactly what decode_ppm refuses
    assert (decode_ppm(payloads[1][0]) == img).all()
    import pytest
    with pytest.raises(ValueError):
        decode_ppm(payloads[4][0])


def test_featurize_with_routing_merges_external_arm(spark):
    """End-to-end decoder seam: a mixed table of native PPMs and
    synthetic 'XZ01'-wrapped PPMs (compressed stand-in, routed external)
    goes through featurize_with_routing with a stub decoder pool that
    unwraps the container inside mapInPandas. Both arms must land in ONE
    features table with identical schema, and each external row's
    feature must equal the feature of its unwrapped payload."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_ppm, extract_features, featurize_with_routing,
    )

    def make_img(i):
        rng = np.random.RandomState(100 + i)
        return rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)

    rows = []
    for i in range(8):
        ppm = encode_ppm(make_img(i))
        # odd ids wear the fake compressed container -> route external
        payload = b"XZ01" + ppm if i % 2 else ppm
        rows.append((i, "image", bytearray(payload),
                     (8, 8, None, None, "xz" if i % 2 else "ppm")))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)

    def stub_decoder_pool(ext_df):
        """Stand-in for the JPEG/MP3/H.264 service: strips the 4-byte
        container magic, returning payloads the native codecs decode."""
        import pandas as pd

        def unwrap(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["content"] = [
                    bytearray(bytes(c)[4:]) for c in pdf["content"]]
                yield pdf

        return ext_df.mapInPandas(unwrap, MEDIA_SCHEMA)

    feats = featurize_with_routing(media, stub_decoder_pool, dim=16)
    got = {r["media_id"]: r for r in feats.collect()}
    # every row present, one schema, real features on both arms
    assert sorted(got) == list(range(8))
    assert feats.columns == ["media_id", "media_type", "feature"]
    # external rows featurize exactly like their unwrapped payloads
    direct = spark.createDataFrame(
        [(i, "image", bytearray(encode_ppm(make_img(i))),
          (8, 8, None, None, "ppm")) for i in range(8)], MEDIA_SCHEMA)
    want = {r["media_id"]: r["feature"]
            for r in extract_features(direct, dim=16, codec="real").collect()}
    for i in range(8):
        assert got[i]["feature"] == pytest.approx(want[i]), i


def test_audio_envelope_hash_stereo_and_perturbation(spark):
    """Envelope hash is channel-mean based (a stereo clip whose channel
    mean equals a mono clip hashes identically), and blowing ONE block's
    amplitude flips at most the 2 comparisons touching it."""
    import numpy as np

    from graph_database_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_envelope_hash, encode_wav,
    )
    # monotone ramp: every gradient bit is 1, so the perturbation's
    # effect is fully predictable (blow block 20 to 3000 ⇒ bit 19 stays
    # 1, bit 20 flips to 0 — exactly one flip)
    amps = (100 + 10 * np.arange(65)).astype(np.int16)
    mono = np.repeat(amps, 16)
    stereo = np.stack([mono + 50, mono - 50], axis=1).astype(np.int16)
    pert_amps = amps.copy()
    pert_amps[20] = 3000
    pert = np.repeat(pert_amps, 16)
    rows = [
        (0, "audio", bytearray(encode_wav(mono, 16000)),
         (None, None, 16000, 65, "wav")),
        (1, "audio", bytearray(encode_wav(stereo, 16000)),
         (None, None, 16000, 65, "wav")),
        (2, "audio", bytearray(encode_wav(pert, 16000)),
         (None, None, 16000, 65, "wav")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["ehash"]
           for r in audio_envelope_hash(media).collect()}
    # NOTE stereo != mono here: mean-square of (v±50) is v²+2500, a
    # constant shift — gradient signs are unchanged, so hashes match
    assert got[0] == got[1]
    flipped = (got[0] ^ got[2]) & ((1 << 64) - 1)
    assert flipped == 1 << 20


def test_image_dhash_rejects_undersized_images(spark):
    """An image smaller than the dHash grid must fail loudly: empty
    linspace slices would yield NaN grid means and an all-zero hash
    that spuriously matches every other degenerate image."""
    import numpy as np
    import pytest

    from graph_database_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_ppm, image_dhash,
    )

    tiny = np.full((4, 4, 3), 128, dtype=np.uint8)  # 4x4 < 8x9 grid
    media = spark.createDataFrame(
        [(0, "image", bytearray(encode_ppm(tiny)), (4, 4, None, None,
                                                    "ppm"))],
        MEDIA_SCHEMA)
    # the executor-side ValueError surfaces wrapped by the Python runner
    with pytest.raises(Exception, match="smaller than the dHash grid"):
        image_dhash(media).collect()

"""Multimodal scaffold: the Ray-side plumbing (schemas, actor-pool
stages, batch shapes, output layout) is real; the codec decode is a
clearly-marked stub (strict mode raises NotImplementedError)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from idf.functions.media import (
    AUDIO_SCHEMA,
    VIDEO_SCHEMA,
    AudioFeaturizer,
    VideoFrameSampler,
    audio_features,
    video_frames,
)


def _audio_table(n=12):
    rng = np.random.default_rng(0)
    return pa.table(
        {
            "media_id": [f"a{i}" for i in range(n)],
            "bytes": pa.array([bytes(rng.integers(0, 256, 256, dtype=np.uint8)) for _ in range(n)], pa.binary()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_channels": pa.array([1] * n, pa.int32()),
            "fmt": ["wav"] * n,
        },
        schema=AUDIO_SCHEMA,
    )


def _video_table(n=6):
    rng = np.random.default_rng(1)
    return pa.table(
        {
            "media_id": [f"v{i}" for i in range(n)],
            "bytes": pa.array([bytes(rng.integers(0, 256, 512, dtype=np.uint8)) for _ in range(n)], pa.binary()),
            "fps": pa.array([30.0] * n, pa.float32()),
            "n_frames": pa.array([90 + 30 * i for i in range(n)], pa.int32()),
            "w": pa.array([640] * n, pa.int32()),
            "h": pa.array([360] * n, pa.int32()),
            "fmt": ["mp4"] * n,
        },
        schema=VIDEO_SCHEMA,
    )


def test_audio_features_actor_pool(ray_session):
    out = audio_features(rd.from_arrow(_audio_table())).to_pandas()
    assert len(out) == 12
    assert all(len(f) == AudioFeaturizer.N_MEL for f in out["features"])
    # deterministic across runs (stub decode is seeded by content)
    out2 = audio_features(rd.from_arrow(_audio_table())).to_pandas()
    a = {r["media_id"]: list(r["features"]) for _, r in out.iterrows()}
    b = {r["media_id"]: list(r["features"]) for _, r in out2.iterrows()}
    assert a == b


def test_video_frame_sampling(ray_session):
    out = video_frames(rd.from_arrow(_video_table()), every_n=30).to_pandas()
    # one row per sampled frame: n_frames=90 -> idx {0,30,60}, etc.
    counts = out.groupby("media_id").size()
    assert counts["v0"] == 3 and counts["v5"] == 8
    assert set(out[out["media_id"] == "v0"]["frame_idx"]) == {0, 30, 60}
    assert out["frame_bytes"].map(len).eq(16).all()


def test_strict_mode_raises():
    t = _audio_table(2)
    with pytest.raises(NotImplementedError):
        AudioFeaturizer(strict=True)(t)
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(strict=True)(_video_table(1))


def test_image_thumbnails_real_roundtrip(ray_session, small_images_table):
    """The thumbnail stage is fully real: decode -> resize -> PNG, and
    the output PNG round-trips through the engine's own codec with the
    expected geometry."""
    from idf import codecs
    from idf.functions.media import image_thumbnails

    imgs = rd.read_parquet(small_images_table)
    out = image_thumbnails(imgs, max_side=16).to_pandas()
    src = rd.read_parquet(small_images_table).to_pandas()
    assert len(out) == len(src)
    ok = out[out["status"] == "ok"]
    assert len(ok) > 0
    for _, r in ok.head(8).iterrows():
        thumb = codecs.decode(r["thumb"], "png")
        assert thumb.shape[0] == r["h"] and thumb.shape[1] == r["w"]
        assert max(r["h"], r["w"]) <= 16
    # deterministic bytes across runs
    out2 = image_thumbnails(rd.read_parquet(small_images_table), max_side=16).to_pandas()
    m1 = dict(zip(out["image_id"], out["thumb"].map(lambda b: hash(bytes(b)))))
    m2 = dict(zip(out2["image_id"], out2["thumb"].map(lambda b: hash(bytes(b)))))
    assert m1 == m2

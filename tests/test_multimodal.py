"""Multimodal stage tests: FAKE-codec decode, resize/feature math, audio
chunking, frame-sampling plan, and the Ray actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from elastiknn_ray.stages.multimodal import (
    AudioChunkStage,
    ImageDecodeStage,
    decode_image,
    encode_fake_image,
    fake_audio_table,
    fake_images_table,
    patch_features,
    resize_nearest,
    sample_frame_indices,
)


def test_fake_codec_roundtrip():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    buf = encode_fake_image(20, 30, 3, px)
    out = decode_image(buf)
    assert (out == px).all()


def test_decode_unknown_format_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\nrestofpng")


def test_resize_nearest_identity_and_shape():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    assert (resize_nearest(img, 16, 16) == img).all()
    assert resize_nearest(img, 7, 9).shape == (7, 9, 3)


def test_patch_features_shape_and_determinism():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 41, 3)).astype(np.uint8)
    f1 = patch_features(img, grid=4)
    f2 = patch_features(img, grid=4)
    assert f1.shape == (48,)
    assert (f1 == f2).all()
    assert 0.0 <= f1.min() and f1.max() <= 1.0


def test_sample_frame_indices():
    ix = sample_frame_indices(100, every=7, max_frames=10)
    assert ix.tolist() == [0, 7, 14, 21, 28, 35, 42, 49, 56, 63]
    assert sample_frame_indices(3, every=10, max_frames=5).tolist() == [0]


def test_image_decode_stage_in_ray(ray_session):
    import ray.data as rd

    tbl = fake_images_table(20, seed=3)
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"thumb": 8, "grid": 2},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    assert len(out) == 20
    assert set(out.columns) == {
        "image_id", "height", "width", "channels", "thumb", "embedding",
    }
    # metadata matches the source table; thumbnails are 8x8x3 bytes
    src = tbl.to_pandas().set_index("image_id")
    for _, row in out.iterrows():
        assert row["height"] == src.loc[row["image_id"], "height"]
        assert len(row["thumb"]) == 8 * 8 * 3
        assert len(row["embedding"]) == 2 * 2 * 3


def test_audio_chunk_stage_in_ray(ray_session):
    import ray.data as rd

    tbl = fake_audio_table(5, seed=4, rate=1000)
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            AudioChunkStage,
            fn_constructor_kwargs={"chunk_s": 0.5},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    assert len(out) > 0
    assert (out["rms"] > 0).all()
    # chunk counts per audio match floor(len / (rate * chunk_s))
    src = tbl.to_pandas()
    for aid, buf in zip(src["audio_id"], src["audio"]):
        n_samples = (len(buf) - 12) // 4
        expect = n_samples // 500
        got = (out["audio_id"] == aid).sum()
        assert got == expect, aid

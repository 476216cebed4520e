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
    # JPEG (no built-in decoder) hits the marked stub boundary
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0rest-of-jpeg")
    # a PNG signature routes to the REAL decoder, which rejects corrupt data
    with pytest.raises(ValueError):
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
    from elastiknn_ray.stages.codecs import wav_decode
    from elastiknn_ray.stages.multimodal import FAKE_AUDIO_MAGIC

    src = tbl.to_pandas()
    for aid, buf in zip(src["audio_id"], src["audio"]):
        if bytes(buf[:8]) == FAKE_AUDIO_MAGIC:
            n_samples = (len(buf) - 12) // 4
        else:  # real WAV payload
            n_samples = len(wav_decode(bytes(buf))[1])
        expect = n_samples // 500
        got = (out["audio_id"] == aid).sum()
        assert got == expect, aid


def test_png_roundtrip_all_shapes():
    """Real PNG codec: encode (filter 0) -> decode reproduces pixels for
    gray/gray+alpha/RGB/RGBA."""
    import numpy as np

    from elastiknn_ray.stages.codecs import png_decode, png_encode

    rng = np.random.default_rng(3)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 17, ch)).astype(np.uint8)
        out = png_decode(png_encode(img))
        assert out.shape == (13, 17, ch)
        assert (out == img).all(), ch


def test_png_decode_all_filters():
    """Decoder must handle every scanline filter: forward-filter rows
    manually (per the PNG spec) and check reconstruction."""
    import struct
    import zlib

    import numpy as np

    from elastiknn_ray.stages.codecs import PNG_SIG, png_decode

    rng = np.random.default_rng(4)
    h, w, ch = 6, 9, 3
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    stride = w * ch

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)

    raw = b""
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = img[y].reshape(stride)
        f = y % 5
        filt = np.empty(stride, dtype=np.uint8)
        for i in range(stride):
            left = int(line[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                pred = paeth(left, up, ul)
            filt[i] = (int(line[i]) - pred) % 256
        raw += bytes([f]) + filt.tobytes()
        prev = line

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = png_decode(png)
    assert (out == img).all()


def test_wav_roundtrip_and_stage(ray_session):
    """Real WAV codec + the audio stage consuming genuine WAV payloads."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.codecs import wav_decode, wav_encode
    from elastiknn_ray.stages.multimodal import AudioChunkStage

    rng = np.random.default_rng(5)
    rate = 8000
    x = rng.normal(0, 0.1, rate * 2).astype(np.float32).clip(-1, 1)
    rate2, y = wav_decode(wav_encode(rate, x))
    assert rate2 == rate
    assert np.abs(x - y).max() < 1e-3  # 16-bit quantization

    ds = rd.from_arrow(
        pa.table(
            {
                "audio_id": pa.array([0, 1], pa.int64()),
                "audio": pa.array(
                    [wav_encode(rate, x), wav_encode(rate, x[: rate // 2])],
                    pa.binary(),
                ),
            }
        )
    )
    out = ds.map_batches(
        AudioChunkStage, fn_constructor_kwargs={"chunk_s": 0.5},
        batch_format="pyarrow", batch_size=2, concurrency=1,
    ).to_pandas()
    # 2s audio -> 4 chunks of 0.5s; 0.5s audio -> 1 chunk
    assert len(out[out["audio_id"] == 0]) == 4
    assert len(out[out["audio_id"] == 1]) == 1
    assert (out["rms"] > 0).all()


def test_image_stage_consumes_real_png(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.codecs import png_encode
    from elastiknn_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 256, (24, 31, 3)).astype(np.uint8) for _ in range(3)]
    ds = rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array(range(3), pa.int64()),
                "image": pa.array([png_encode(i) for i in imgs], pa.binary()),
            }
        )
    )
    out = ds.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"thumb": 8, "grid": 2},
        batch_format="pyarrow", batch_size=2, concurrency=1,
    ).to_pandas()
    assert (out["height"] == 24).all() and (out["width"] == 31).all()
    assert len(out["embedding"].iloc[0]) == 2 * 2 * 3


def test_video_frame_sample_stage(ray_session):
    """Video stage: frame-sampling plan + per-frame thumbnail/features over
    the fake codec; only planned frames are emitted."""
    import numpy as np
    import ray.data as rd

    from elastiknn_ray.stages.multimodal import (
        VideoFrameSampleStage,
        fake_videos_table,
        sample_frame_indices,
    )

    tbl = fake_videos_table(6, seed=3)
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"every": 5, "max_frames": 4, "thumb": 8, "grid": 2},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=(1, 2),
        )
        .to_pandas()
    )
    assert len(out) > 0
    # per-video row count matches the sampling plan on the encoded n_frames
    src = tbl.to_pandas()
    for vid, buf in zip(src["video_id"], src["video"]):
        n = int(np.frombuffer(bytes(buf[8:12]), dtype=np.int32)[0])
        expect = len(sample_frame_indices(n, 5, 4))
        assert (out["video_id"] == vid).sum() == expect, vid
    assert len(out["embedding"].iloc[0]) == 2 * 2 * 3


# -------------------------------------------------- perceptual image hashing


def test_dhash_phash_determinism_and_invariances():
    from elastiknn_ray.stages.multimodal import dhash64, fake_images_with_dups, phash64

    t = fake_images_with_dups(6, dups_per_base=2, seed=3)
    imgs = [decode_image(b) for b in t.column("image").to_pylist()]
    h1 = [int(dhash64(i)) for i in imgs]
    h2 = [int(dhash64(i)) for i in imgs]
    assert h1 == h2  # bit-for-bit deterministic
    # brightness shift leaves gradient signs (dHash bits) nearly unchanged
    base = imgs[0]
    shifted = np.clip(base.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    assert bin(int(dhash64(base)) ^ int(dhash64(shifted))).count("1") <= 2
    assert bin(int(phash64(base)) ^ int(phash64(shifted))).count("1") <= 4
    # a 2x nearest upscale is (near-)hash-invariant under area resampling
    up = resize_nearest(base, base.shape[0] * 2, base.shape[1] * 2)
    assert bin(int(dhash64(base)) ^ int(dhash64(up))).count("1") <= 4


def test_planted_image_dup_separation():
    """The planted corpus must be separable at the pipeline's default tau:
    every variant within 10 bits of its base, every cross-base pair beyond."""
    from elastiknn_ray.stages.multimodal import dhash64, fake_images_with_dups

    t = fake_images_with_dups(25, dups_per_base=3, seed=21)
    hashes = {
        iid: int(dhash64(decode_image(buf)))
        for iid, buf in zip(
            t.column("image_id").to_pylist(), t.column("image").to_pylist()
        )
    }
    for iid, h in hashes.items():
        if iid % 1000 == 0:
            continue
        assert bin(h ^ hashes[(iid // 1000) * 1000]).count("1") <= 10, iid
    bases = {k: v for k, v in hashes.items() if k % 1000 == 0}
    ks = sorted(bases)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            assert bin(bases[a] ^ bases[b]).count("1") > 12, (a, b)


def test_image_near_dup_pipeline_recall_precision(ray_session):
    """End-to-end perceptual near-dup: planted (base, variant) groups must
    come back as clusters — recall 1.0 on planted pairs, zero cross-base
    merges (the multimodal analogue of the text flagship's recall pin)."""
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import image_near_dup_pipeline
    from elastiknn_ray.stages.multimodal import fake_images_with_dups

    t = fake_images_with_dups(25, dups_per_base=3, seed=21)
    res = image_near_dup_pipeline(rd.from_arrow(t), hash_concurrency=(1, 2))
    clusters = res.clusters.to_pandas()
    cluster_of = dict(zip(clusters.doc_id, clusters.cluster_id))
    planted = recovered = 0
    for iid in t.column("image_id").to_pylist():
        if iid % 1000 == 0:
            continue
        planted += 1
        base = (iid // 1000) * 1000
        if iid in cluster_of and cluster_of.get(base) == cluster_of[iid]:
            recovered += 1
    assert planted == 75
    assert recovered / planted >= 0.99  # north-rule recall bar on pairs
    # precision: no cluster may span two different base images
    by_cluster = clusters.groupby("cluster_id")["doc_id"].apply(
        lambda s: {int(x) // 1000 for x in s}
    )
    assert all(len(bs) == 1 for bs in by_cluster), "cross-base merge"
    # the verified pair list carries exact Hamming similarity >= tau
    pairs = res.pairs.to_pandas()
    assert (pairs.hamming >= 0.84375 - 1e-12).all()


def test_image_perceptual_hash_stage_schema(ray_session):
    """Stage output drops into the Hamming path: (doc_id, simhash 8-byte
    packed, phash 8-byte packed) and round-trips through decode_sigs."""
    import ray.data as rd

    from elastiknn_ray.stages.multimodal import (
        ImagePerceptualHashStage,
        dhash64,
        fake_images_with_dups,
    )
    from elastiknn_ray.stages.simhash import decode_sigs

    t = fake_images_with_dups(4, dups_per_base=1, seed=5)
    out = (
        rd.from_arrow(t)
        .map_batches(
            ImagePerceptualHashStage,
            batch_format="pyarrow",
            batch_size=4,
            concurrency=(1, 2),
        )
        .sort("doc_id")
        .to_pandas()
    )
    assert list(out.columns) == ["doc_id", "simhash", "phash"]
    sig = decode_sigs(pa.array(list(out.simhash), pa.binary()))
    assert sig.shape == (8, 1) and sig.dtype == np.uint64
    want = [
        int(dhash64(decode_image(b))) for b in t.column("image").to_pylist()
    ]
    got = [int(x[0]) for x in sig[np.argsort(out.doc_id.to_numpy())]]
    assert sorted(got) == sorted(want)

"""Multimodal (image/audio/video) pipeline stages over opaque ``binary``
columns with typed metadata — the Ray-side plumbing (schema, actor-pool
signature, batch sizing, output layout) is real and tested; only the
third-party CODEC is stubbed, because no image/audio library ships in this
container.

Decode strategy per stage:
- if a real decoder import succeeds (PIL / soundfile), use it;
- else, bytes beginning with the FAKE magic decode deterministically via the
  in-repo codec below (used by the synthetic source and tests);
- else, raise NotImplementedError — clearly marking the stub boundary.

Everything after decode (resize, patch features, frame sampling) is real
vectorized numpy and fully exercised in tests.

Large binary payloads need SMALL batch sizes: a 4K RGB frame is ~24MB, so
``batch_size`` here defaults to 32 (batch x concurrency must fit worker
heap — SURVEY.md §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FAKE_MAGIC = b"FAKEIMG1"
FAKE_AUDIO_MAGIC = b"FAKEAUD1"

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("image", pa.binary()),
        ("fmt", pa.string()),
        ("height", pa.int32()),
        ("width", pa.int32()),
    ]
)


def encode_fake_image(h: int, w: int, c: int, pixels: np.ndarray) -> bytes:
    """In-repo deterministic 'codec': magic + dims + raw uint8 pixels."""
    assert pixels.shape == (h, w, c) and pixels.dtype == np.uint8
    head = FAKE_MAGIC + np.array([h, w, c], dtype=np.int32).tobytes()
    return head + pixels.tobytes()


def decode_image(buf: bytes) -> np.ndarray:
    """binary → (H, W, C) uint8.

    Decoder ladder: PNG via the REAL dependency-free decoder
    (stages/codecs.py, stdlib zlib + numpy unfiltering), the in-repo FAKE
    codec for synthetic payloads, then PIL if installed; anything else hits
    the clearly-marked stub boundary (NotImplementedError)."""
    if buf[:8] == FAKE_MAGIC:
        h, w, c = np.frombuffer(buf[8:20], dtype=np.int32)
        return np.frombuffer(buf[20:], dtype=np.uint8).reshape(h, w, c)
    from elastiknn_ray.stages.codecs import PNG_SIG, png_decode

    if buf[:8] == PNG_SIG:
        return png_decode(buf)
    try:  # pragma: no cover - PIL absent in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "no decoder for this image format in this environment (PNG and "
            "the FAKE codec are built in; plug PIL/turbojpeg here for the rest)"
        )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (real, not stubbed)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def patch_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Mean-pooled grid patch features → float32 (grid*grid*C,) embedding."""
    g = resize_nearest(img, grid * 8, grid * 8).astype(np.float32) / 255.0
    c = g.shape[2]
    out = g.reshape(grid, 8, grid, 8, c).mean(axis=(1, 3))
    return out.reshape(grid * grid * c)


class ImageDecodeStage:
    """Actor-pool stage: (image_id, image binary) → decoded metadata +
    resized thumbnail + patch-feature embedding.

    Run as ``map_batches(ImageDecodeStage, fn_constructor_kwargs=...,
    batch_size=32, concurrency=(1, N))`` — decoder state (a real pipeline's
    codec context / model) initializes once per actor here.
    """

    def __init__(self, thumb: int = 32, grid: int = 4):
        self.thumb = thumb
        self.grid = grid
        # real pipelines: open codec context / load feature model ONCE here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_numpy()
        heights, widths, chans, thumbs, feats = [], [], [], [], []
        for buf in batch.column("image").to_pylist():
            img = decode_image(buf)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            chans.append(img.shape[2])
            t = resize_nearest(img, self.thumb, self.thumb)
            thumbs.append(t.tobytes())
            feats.append(patch_features(img, self.grid))
        dim = self.grid * self.grid * (chans[0] if chans else 3)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.int64()),
                "height": pa.array(heights, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "thumb": pa.array(thumbs, pa.binary()),
                "embedding": pa.array(
                    [f.astype(np.float32) for f in feats],
                    pa.list_(pa.float32(), dim),
                ),
            }
        )


def sample_frame_indices(n_frames: int, every: int, max_frames: int) -> np.ndarray:
    """Deterministic frame-sampling plan (video path): every k-th frame,
    capped — pure metadata computation, no decode needed."""
    ix = np.arange(0, n_frames, every, dtype=np.int64)
    return ix[:max_frames]


class AudioChunkStage:
    """(audio_id, audio binary, sample_rate) → fixed-length chunk rows with
    RMS energy per chunk.  FAKE_AUDIO payloads = magic + int32 rate + float32
    samples; real decoders plug in at the marked stub."""

    def __init__(self, chunk_s: float = 1.0):
        self.chunk_s = chunk_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_ix, out_rms = [], [], []
        for aid, buf in zip(
            batch.column("audio_id").to_pylist(), batch.column("audio").to_pylist()
        ):
            if buf[:8] == FAKE_AUDIO_MAGIC:
                rate = int(np.frombuffer(buf[8:12], dtype=np.int32)[0])
                samples = np.frombuffer(buf[12:], dtype=np.float32)
            elif buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
                # REAL decoder: stdlib wave container + numpy PCM conversion
                from elastiknn_ray.stages.codecs import wav_decode

                rate, samples = wav_decode(buf)
            else:
                raise NotImplementedError(
                    "no decoder for this audio format (PCM WAV and the FAKE "
                    "codec are built in; plug soundfile here for the rest)"
                )
            n = int(rate * self.chunk_s)
            for ci in range(0, len(samples) // n):
                seg = samples[ci * n : (ci + 1) * n]
                out_id.append(aid)
                out_ix.append(ci)
                out_rms.append(float(np.sqrt(np.mean(seg * seg))))
        return pa.table(
            {
                "audio_id": pa.array(out_id, pa.int64()),
                "chunk_ix": pa.array(out_ix, pa.int64()),
                "rms": pa.array(out_rms, pa.float64()),
            }
        )


def fake_images_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic image table for tests/benches — every third
    payload is a REAL PNG (stages/codecs.py), the rest use the FAKE codec,
    so consumers exercise both decode paths."""
    from elastiknn_ray.stages.codecs import png_encode

    rows_id, rows_img, fmts, hs, ws = [], [], [], [], []
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        h = int(rng.integers(16, 64))
        w = int(rng.integers(16, 64))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rows_id.append(i)
        if i % 3 == 0:
            rows_img.append(png_encode(px))
            fmts.append("png")
        else:
            rows_img.append(encode_fake_image(h, w, 3, px))
            fmts.append("fake")
        hs.append(h)
        ws.append(w)
    return pa.table(
        {
            "image_id": pa.array(rows_id, pa.int64()),
            "image": pa.array(rows_img, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
        }
    )


def fake_audio_table(n: int, seed: int = 0, rate: int = 8000) -> pa.Table:
    """Synthetic audio table — every third payload is a REAL 16-bit PCM WAV
    (stages/codecs.py), the rest use the FAKE codec."""
    from elastiknn_ray.stages.codecs import wav_encode

    ids, bufs = [], []
    for i in range(n):
        rng = np.random.default_rng((seed, i, 0xA))
        secs = float(rng.uniform(0.5, 3.0))
        samples = rng.normal(0, 0.1, int(rate * secs)).astype(np.float32)
        if i % 3 == 0:
            buf = wav_encode(rate, samples)
        else:
            buf = (
                FAKE_AUDIO_MAGIC
                + np.array([rate], dtype=np.int32).tobytes()
                + samples.tobytes()
            )
        ids.append(i)
        bufs.append(buf)
    return pa.table(
        {"audio_id": pa.array(ids, pa.int64()), "audio": pa.array(bufs, pa.binary())}
    )


FAKE_VIDEO_MAGIC = b"FAKEVID1"


def encode_fake_video(frames: np.ndarray) -> bytes:
    """In-repo deterministic video 'codec': magic + (n, h, w, c) int32 dims +
    raw uint8 frames (n, h, w, c)."""
    n, h, w, c = frames.shape
    head = FAKE_VIDEO_MAGIC + np.array([n, h, w, c], dtype=np.int32).tobytes()
    return head + np.ascontiguousarray(frames).tobytes()


class VideoFrameSampleStage:
    """(video_id, video binary) → one row per SAMPLED frame with a
    thumbnail + patch-feature embedding (frame-sample plan from
    ``sample_frame_indices``; decode-only-sampled-frames semantics — a real
    codec seeks keyframes, the fake codec slices the frame array).

    Actor pool with SMALL batch_size: raw video payloads are the largest
    blobs in the corpus (batch x concurrency must fit worker heap)."""

    def __init__(self, every: int = 5, max_frames: int = 8, thumb: int = 16, grid: int = 2):
        self.every = every
        self.max_frames = max_frames
        self.thumb = thumb
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_ix, thumbs, feats, chans = [], [], [], [], []
        for vid, buf in zip(
            batch.column("video_id").to_pylist(), batch.column("video").to_pylist()
        ):
            if buf[:8] != FAKE_VIDEO_MAGIC:
                raise NotImplementedError(
                    "no video decoder available (stubbed; plug pyav/ffmpeg "
                    "here — the frame-sampling plan and per-frame compute "
                    "below are real)"
                )
            n, h, w, c = np.frombuffer(buf[8:24], dtype=np.int32)
            frames = np.frombuffer(buf[24:], dtype=np.uint8).reshape(n, h, w, c)
            for ix in sample_frame_indices(n, self.every, self.max_frames):
                f = frames[ix]
                out_id.append(vid)
                out_ix.append(int(ix))
                thumbs.append(resize_nearest(f, self.thumb, self.thumb).tobytes())
                feats.append(patch_features(f, self.grid))
                chans.append(c)
        dim = self.grid * self.grid * (chans[0] if chans else 3)
        return pa.table(
            {
                "video_id": pa.array(out_id, pa.int64()),
                "frame_ix": pa.array(out_ix, pa.int64()),
                "thumb": pa.array(thumbs, pa.binary()),
                "embedding": pa.array(
                    [f.astype(np.float32) for f in feats],
                    pa.list_(pa.float32(), dim),
                ),
            }
        )


def fake_videos_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic video table (FAKE codec)."""
    ids, bufs = [], []
    for i in range(n):
        rng = np.random.default_rng((seed, i, 0xA1))
        nf = int(rng.integers(8, 40))
        h = int(rng.integers(16, 32))
        w = int(rng.integers(16, 32))
        frames = rng.integers(0, 256, (nf, h, w, 3)).astype(np.uint8)
        ids.append(i)
        bufs.append(encode_fake_video(frames))
    return pa.table(
        {"video_id": pa.array(ids, pa.int64()), "video": pa.array(bufs, pa.binary())}
    )

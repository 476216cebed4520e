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


# -------------------------------------------------- perceptual image hashing
#
# The multimodal analogue of the text near-dup story: a 64-bit perceptual
# hash per image feeds the EXISTING Hamming machinery unchanged
# (stages/simhash.py knn_exact_hamming_sig / bitsample bands /
# verify_hamming_pairs with dims=64) — the same read path that mirrors the
# reference's bit-sampling LSH (HammingLshModel.java).  dHash (gradient
# hash) is the cheap default; pHash (DCT low-frequency median hash) is the
# rotation-of-the-same-idea second opinion.  Both are pure numpy — real,
# not stubbed — everything upstream of them is the decode ladder above.


def grayscale_f32(img: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (H, W) float32 ITU-R BT.601 luma."""
    if img.ndim == 2:
        return img.astype(np.float32)
    f = img.astype(np.float32)
    if f.shape[2] == 1:
        return f[:, :, 0]
    return f[:, :, 0] * 0.299 + f[:, :, 1] * 0.587 + f[:, :, 2] * 0.114


def _resize_area_f32(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box/area downsample of a float32 (H, W) image — averaging (not
    nearest) is what makes the perceptual hashes stable under the small
    pixel-level perturbations a near-dup carries."""
    h, w = img.shape
    ye = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xe = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    # integral image → O(1) per output cell box sum
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = img.cumsum(axis=0).cumsum(axis=1)
    ys, yl = ye[:-1], ye[1:]
    xs, xl = xe[:-1], xe[1:]
    # upsampling (out > in) would create zero-area boxes → clamp each box to
    # cover at least one source pixel (nearest-pixel semantics there)
    ys = np.minimum(ys, h - 1)
    xs = np.minimum(xs, w - 1)
    yl = np.maximum(yl, ys + 1)
    xl = np.maximum(xl, xs + 1)
    box = (
        ii[yl[:, None], xl[None, :]]
        - ii[ys[:, None], xl[None, :]]
        - ii[yl[:, None], xs[None, :]]
        + ii[ys[:, None], xs[None, :]]
    )
    area = (yl - ys)[:, None] * (xl - xs)[None, :]
    return (box / area).astype(np.float32)


def _pack_bits64(bits: np.ndarray) -> np.uint64:
    """64 booleans (row-major) → one uint64, bit 0 = first bool."""
    b = np.asarray(bits, dtype=np.uint8).reshape(64)
    return np.uint64(np.packbits(b, bitorder="little").view(np.uint64)[0])


def dhash64(img: np.ndarray) -> np.uint64:
    """Difference hash: 9x8 area-resized luma, bit = left pixel > right
    pixel along each row — 64 horizontal-gradient signs.  Robust to
    brightness shift (gradient signs are shift-invariant) and to re-encode
    noise (area averaging)."""
    g = _resize_area_f32(grayscale_f32(img), 8, 9)
    return _pack_bits64(g[:, :-1] > g[:, 1:])


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n, n), cached."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        j = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * j + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(img: np.ndarray) -> np.uint64:
    """DCT perceptual hash: 32x32 area-resized luma → 2-D DCT-II → top-left
    8x8 low-frequency block → bit = coefficient > median (DC term excluded
    from the median so flat images don't flip half their bits on noise)."""
    g = _resize_area_f32(grayscale_f32(img), 32, 32).astype(np.float64)
    m = _dct_matrix(32)
    coef = (m @ g @ m.T)[:8, :8].copy()
    flat = coef.reshape(64)
    med = np.median(flat[1:])
    return _pack_bits64(flat > med)


class ImagePerceptualHashStage:
    """Actor-pool stage: (image_id, image binary) → (doc_id, simhash,
    phash) where ``simhash`` is the 8-byte packed dHash and ``phash`` the
    8-byte packed pHash — column names chosen so the output drops straight
    into the Hamming kNN/LSH/verify path (stages/simhash.py) with dims=64.

    Decode state initializes once per actor; run with a SMALL batch_size
    (image payloads dominate batch bytes, same sizing note as
    ImageDecodeStage)."""

    def __init__(self):
        _dct_matrix(32)  # build the DCT basis once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from elastiknn_ray.stages.simhash import encode_sigs

        ids = batch.column("image_id").to_numpy()
        n = len(ids)
        dh = np.empty((n, 1), dtype=np.uint64)
        ph = np.empty((n, 1), dtype=np.uint64)
        for i, buf in enumerate(batch.column("image").to_pylist()):
            img = decode_image(buf)
            dh[i, 0] = dhash64(img)
            ph[i, 0] = phash64(img)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": encode_sigs(dh),
                "phash": encode_sigs(ph),
            }
        )


def fake_images_with_dups(
    n_base: int, dups_per_base: int = 2, seed: int = 0
) -> pa.Table:
    """Deterministic planted near-dup image corpus.

    Base images are LOW-FREQUENCY (random 8x8 upsampled bilinearly to
    ~64x64 — web thumbnails, logos, screenshots are smooth at hash scale;
    pure per-pixel noise has no perceptual identity for ANY perceptual
    hash).  Each base gets ``dups_per_base`` perturbed variants: brightness
    shift, mild additive noise, or a re-scale — the transformations a
    near-dup image actually survives on the web.  image_id = base*1000+v
    (v=0 is the original), so tests recover ground truth from the id.
    """
    rows_id, rows_img, fmts, hs, ws = [], [], [], [], []
    for b in range(n_base):
        rng = np.random.default_rng((seed, b, 0xD0))
        h = int(rng.integers(48, 80))
        w = int(rng.integers(48, 80))
        lo = rng.uniform(0, 255, (8, 8, 3))
        # bilinear upsample via two 1-D interps
        yi = np.linspace(0, 7, h)
        xi = np.linspace(0, 7, w)
        y0 = np.clip(yi.astype(np.int64), 0, 6)
        x0 = np.clip(xi.astype(np.int64), 0, 6)
        fy = (yi - y0)[:, None, None]
        fx = (xi - x0)[None, :, None]
        a = lo[y0][:, x0]
        bx = lo[y0][:, x0 + 1]
        c = lo[y0 + 1][:, x0]
        d = lo[y0 + 1][:, x0 + 1]
        base = (
            a * (1 - fy) * (1 - fx) + bx * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx
        )
        variants = [np.clip(base, 0, 255).astype(np.uint8)]
        for v in range(dups_per_base):
            kind = v % 3
            if kind == 0:  # brightness shift
                pert = base + rng.uniform(-24, 24)
            elif kind == 1:  # mild noise
                pert = base + rng.normal(0, 4.0, base.shape)
            else:  # re-scale (crop-free resize; beyond ~±30% a rescale
                # stops being a near-dup at 64-bit hash granularity)
                sh = max(16, int(h * rng.uniform(0.72, 1.3)))
                sw = max(16, int(w * rng.uniform(0.72, 1.3)))
                pert = resize_nearest(np.clip(base, 0, 255).astype(np.uint8), sh, sw)
            variants.append(np.clip(pert, 0, 255).astype(np.uint8))
        for v, px in enumerate(variants):
            rows_id.append(b * 1000 + v)
            if (b + v) % 3 == 0:
                from elastiknn_ray.stages.codecs import png_encode

                rows_img.append(png_encode(px))
                fmts.append("png")
            else:
                rows_img.append(encode_fake_image(px.shape[0], px.shape[1], 3, px))
                fmts.append("fake")
            hs.append(px.shape[0])
            ws.append(px.shape[1])
    return pa.table(
        {
            "image_id": pa.array(rows_id, pa.int64()),
            "image": pa.array(rows_img, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
        }
    )

"""Real, dependency-free codecs for the multimodal stages.

The container ships no image/audio libraries, but PNG and PCM WAV are
decodable with the standard library alone (zlib / wave) + numpy — so the
multimodal decode boundary is REAL for these formats, with PIL/soundfile
as guarded upgrades for everything else (see stages/multimodal.py).

PNG support (public spec, RFC 2083): 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace; all five scanline
filters.  "Up" and "Sub" unfilter vectorized (uint8 wraparound cumsum);
"Average"/"Paeth" run a per-pixel-column loop vectorized across channels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8.  Raises ValueError on unsupported
    variants (16-bit, palette, interlaced)."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or ctype not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"PNG variant unsupported here (depth={depth}, color={ctype}, "
            f"interlace={interlace}); plug PIL for full coverage"
        )
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: bad scanline payload size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    cur = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = ftypes[y]
        line = cur[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: cumulative sum within each bpp stride class
            rec = np.add.accumulate(
                line.reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up
            rec = line + prev
        elif f == 3:  # Average — left-dependency: loop pixels, vector chans
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.uint16)
            p16 = prev.astype(np.uint16)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                val = line[s] + ((left + p16[s]) >> 1).astype(np.uint8)
                rec[s] = val
                left = val.astype(np.uint16)
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            left = np.zeros(ch, dtype=np.int16)
            ul = np.zeros(ch, dtype=np.int16)
            p16 = prev.astype(np.int16)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = p16[s]
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc = np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, up, ul)
                )
                val = line[s] + pred.astype(np.uint8)
                rec[s] = val
                left = val.astype(np.int16)
                ul = up
        else:
            raise ValueError(f"PNG: unknown filter {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, ch)


def png_encode(img: np.ndarray) -> bytes:
    """(H, W, C) uint8 → PNG bytes (filter 0 scanlines, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(
        b"\x00" + np.ascontiguousarray(img[y]).tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def wav_decode(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (sample_rate, mono float32 samples in [-1, 1]).
    Stdlib ``wave`` handles the container; numpy converts/downmixes."""
    import io
    import wave

    with wave.open(io.BytesIO(buf), "rb") as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"WAV: unsupported sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return rate, x


def wav_encode(rate: int, samples: np.ndarray) -> bytes:
    """Mono float32 [-1, 1] → 16-bit PCM WAV bytes (for tests/synthesis)."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return bio.getvalue()

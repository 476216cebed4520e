"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003) for
cross-partition substring-duplicate discovery.

Every position of a text gets a Rabin-Karp hash of its W-byte window; each
G-window of consecutive hashes selects its (leftmost) minimum — the classic
winnowing guarantee: any exact common run of >= W + G - 1 bytes between two
texts shares at least one SELECTED fingerprint, regardless of alignment.

The rolling hash is computed without a sequential loop: with an odd base B,
powers and inverse-power prefix sums are vectorized in wrap-around uint64
arithmetic (B is invertible mod 2^64), so
``hash(i) = pow(B, i+W-1) * (C[i+W] - C[i])`` for the cumulative
``C[i] = sum_{j<i} s[j] * B^-j``.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_B = _U64(0x9E3779B97F4A7C16 | 1)  # odd => invertible mod 2^64
#: Independent second base for the collision-confirmation hash (the cross
#: path ships (fp, fp2) instead of raw window bytes — equal windows always
#: agree on both; distinct windows agree on both w.p. ~2^-128).
_B2 = _U64(0xC2B2AE3D27D4EB4F | 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _modinv_pow2(b: int) -> int:
    """Inverse of odd b mod 2^64 (Newton iteration)."""
    x = b  # 3 bits correct
    for _ in range(5):
        x = (x * (2 - b * x)) & 0xFFFFFFFFFFFFFFFF
    return x




#: Chunk length for the blocked rolling-hash evaluation.  The window hash is
#: position-independent (hash(i) = sum_t s[i+t] * B^(w-1-t) mod 2^64), so any
#: w-overlapped chunk yields bit-identical hashes to a whole-buffer pass —
#: chunking keeps the ~5 uint64 temporaries L2-resident and lets the power
#: tables be computed once per process instead of once per call.
_CHUNK = 1 << 17
#: per-base (pows, inv) tables of len _CHUNK+1, keyed by the base value
_TABLES: dict = {}


def _power_tables(n: int, base: np.uint64 = _B) -> tuple[np.ndarray, np.ndarray]:
    """pows[j] = base^j, inv[j] = base^-j (mod 2^64) for j <= n; cached for
    the chunk size, computed ad hoc for rare larger-than-chunk calls."""
    inv_b = _U64(_modinv_pow2(int(base)))
    if n <= _CHUNK:
        key = int(base)
        if key not in _TABLES:
            _TABLES[key] = (_powser(base, _CHUNK), _powser(inv_b, _CHUNK))
        return _TABLES[key]
    return _powser(base, n), _powser(inv_b, n)


def _powser(b: np.uint64, n: int) -> np.ndarray:
    p = np.empty(n + 1, dtype=np.uint64)
    p[0] = 1
    np.multiply.accumulate(np.full(n + 1, b, dtype=np.uint64), out=p)
    p = np.roll(p, 1)
    p[0] = 1
    return p


def _rolling_hashes_direct(s: np.ndarray, w: int, base: np.uint64 = _B) -> np.ndarray:
    n = len(s)
    nwin = n - w + 1
    pows, inv = _power_tables(n, base)
    c = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(s.astype(np.uint64) * inv[:n], out=c[1:])
    h = (c[w : n + 1] - c[:nwin]) * pows[w - 1 : n]
    return _splitmix64(h)


def rolling_hashes(s: np.ndarray, w: int, base: np.uint64 = _B) -> np.ndarray:
    """uint64 Rabin-Karp hash of every w-byte window of uint8 array s
    (len(s) - w + 1 hashes), diffused with splitmix64.  Large inputs are
    evaluated in w-overlapped chunks (bit-identical: the hash is
    position-independent)."""
    n = len(s)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    if n <= _CHUNK or w > _CHUNK // 2:
        return _rolling_hashes_direct(s, w, base)
    nwin = n - w + 1
    out = np.empty(nwin, dtype=np.uint64)
    step = _CHUNK - w + 1
    for start in range(0, nwin, step):
        stop = min(start + step, nwin)
        out[start:stop] = _rolling_hashes_direct(s[start : stop + w - 1], w, base)
    return out


def rolling_hashes_at(
    s: np.ndarray, w: int, positions: np.ndarray, base: np.uint64 = _B2
) -> np.ndarray:
    """The same window hash as :func:`rolling_hashes` under ``base``, but
    evaluated ONLY at ``positions`` (ascending window starts) — one cumsum
    over the text plus O(len(positions)) gathers, instead of hashing every
    window."""
    n = len(s)
    pows, inv = _power_tables(n, base)
    c = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(s.astype(np.uint64) * inv[:n], out=c[1:])
    p = np.asarray(positions, dtype=np.int64)
    h = (c[p + w] - c[p]) * pows[p + w - 1]
    return _splitmix64(h)


def winnow_select(h: np.ndarray, g: int) -> np.ndarray:
    """Selected positions (ascending, unique) — the leftmost argmin of every
    g-window of hashes.  len(h) < g selects the single global argmin."""
    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) <= g:
        return np.array([int(np.argmin(h))], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, g)
    am = win.argmin(axis=1) + np.arange(len(h) - g + 1)
    # `am` is non-decreasing (a sliding window's leftmost argmin never moves
    # left: candidates only leave on the left / join on the right), so
    # dedup is a diff filter, not a sort.
    return am[np.diff(am, prepend=-1) > 0].astype(np.int64)


def winnow_fingerprints(
    texts: list[bytes], w: int, g: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per text: winnowed fingerprints.  Returns (row_ix, pos, fp) flat
    arrays — row_ix indexes into ``texts``."""
    rows, poss, fps = [], [], []
    for i, t in enumerate(texts):
        s = np.frombuffer(t, dtype=np.uint8)
        h = rolling_hashes(s, w)
        sel = winnow_select(h, g)
        if len(sel):
            rows.append(np.full(len(sel), i, dtype=np.int64))
            poss.append(sel)
            fps.append(h[sel])
    if not rows:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.uint64),
        )
    return np.concatenate(rows), np.concatenate(poss), np.concatenate(fps)


def winnow_fingerprints_pair(
    texts: list[bytes], w: int, g: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like :func:`winnow_fingerprints` (selection driven by the PRIMARY
    hash, so positions are identical), plus an independent confirmation
    hash of the same windows under base ``_B2``.  Two windows are equal
    iff both 64-bit values agree, up to a ~2^-128 joint collision — the
    cross path's replacement for shipping raw window bytes."""
    rows, poss, fps, fp2s = [], [], [], []
    for i, t in enumerate(texts):
        s = np.frombuffer(t, dtype=np.uint8)
        h = rolling_hashes(s, w)
        sel = winnow_select(h, g)
        if len(sel):
            rows.append(np.full(len(sel), i, dtype=np.int64))
            poss.append(sel)
            fps.append(h[sel])
            fp2s.append(rolling_hashes_at(s, w, sel))
    if not rows:
        e = np.empty(0, np.uint64)
        return np.empty(0, np.int64), np.empty(0, np.int64), e, e
    return (
        np.concatenate(rows),
        np.concatenate(poss),
        np.concatenate(fps),
        np.concatenate(fp2s),
    )

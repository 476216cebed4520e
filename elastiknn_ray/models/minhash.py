"""Batched MinHash + banding kernel — the engine's JaccardLshModel
(elastiknn-models/.../JaccardLshModel.java:27-63) vectorized over a whole
Arrow batch of ragged shingle lists.

Per hash function i (of L*k): ``m_i = min over shingles s of ((1+s)*A_i + B_i)
mod HASH_PRIME`` (JaccardLshModel.java:50-57; shingle IDs are first reduced
mod HASH_PRIME so the arithmetic is exact in uint64).  Per table ixL the k
minhashes are concatenated with the table index into one band identity
(JaccardLshModel.java:59 writeIntsWithPrefix).  The reference encodes bands as
variable-width byte strings; band identity only needs to be injective +
deterministic, so we mix ``(ixL, m_0..m_{k-1})`` into a uint64 with FNV-1a —
collision sets are identical up to a ~2^-64 hash-collision probability
(SURVEY.md §1.1).

Empty vectors hash to a single sentinel band with no table prefix, colliding
with every other empty vector and nothing else (JaccardLshModel.java:37-38:
the same ``writeInt(HASH_PRIME)`` term for all L tables).
"""

from __future__ import annotations

import numpy as np

from elastiknn_ray.config import EMPTY_BAND_SENTINEL, HASH_PRIME
from elastiknn_ray.models.params import MinHashParams

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

#: Hash-function chunk size bounding the (chunk × tile) uint64 temp.
_FN_CHUNK = 16

#: Shingle-tile size: the (FN_CHUNK × TILE) uint64 scratch is ~1 MiB — small
#: enough to stay cache-resident, so the h = (v*a+b) % P passes don't stream
#: through main memory (which is the bottleneck with many concurrent tasks).
_TILE = 8192


class _Workspace:
    """Reusable scratch buffers for the chunked kernel.  Fresh numpy
    allocations page-fault on first touch, which on a virtualized sandbox can
    cost 10-100x the arithmetic; actors therefore hold one workspace across
    batches (stateful-actor-pool pattern, SURVEY.md §2.2 I4)."""

    def __init__(self) -> None:
        self.h = np.empty(0, dtype=np.uint64)

    def get(self, c: int, m: int) -> np.ndarray:
        need = c * m
        if self.h.size < need:
            self.h = np.empty(int(need * 1.3) + 64, dtype=np.uint64)
        return self.h[:need].reshape(c, m)


def minhash_matrix(
    offsets: np.ndarray,
    values: np.ndarray,
    params: MinHashParams,
    ws: _Workspace | None = None,
) -> np.ndarray:
    """Minhash values for N ragged shingle lists.

    ``offsets``: int64 (N+1,) — doc i owns ``values[offsets[i]:offsets[i+1]]``.
    ``values``: uint64 (M,) shingle IDs (any order; need not be unique).
    Returns uint64 (N, L*k); rows of empty docs are undefined (callers mask
    them via :func:`band_hashes`).
    """
    n = len(offsets) - 1
    nf = params.L * params.k
    out = np.empty((n, nf), dtype=np.uint64)
    if len(values) == 0:
        return out
    if ws is None:
        ws = _Workspace()
    m = len(values)
    vplus = (values % HASH_PRIME).astype(np.uint64)
    vplus += np.uint64(1)
    prime = np.uint64(HASH_PRIME)

    # doc tiles: greedy groups of whole docs with ~_TILE shingles each, so
    # every reduceat stays inside its tile (no cross-tile min combining)
    tile_doc_bounds = [0]
    while tile_doc_bounds[-1] < n:
        d = tile_doc_bounds[-1]
        target = offsets[d] + _TILE
        nxt = int(np.searchsorted(offsets, target, side="left"))
        nxt = max(nxt, d + 1)
        tile_doc_bounds.append(min(nxt, n))

    for d0, d1 in zip(tile_doc_bounds[:-1], tile_doc_bounds[1:]):
        v0, v1 = int(offsets[d0]), int(offsets[d1])
        tm = v1 - v0
        if tm == 0:
            continue  # all-empty docs; rows masked by band_hashes()
        vt = vplus[v0:v1]
        # empty docs are EXCLUDED from the reduceat (a clamped start would
        # truncate the preceding doc's segment — reduceat segments run to the
        # next start); their rows stay garbage, masked by band_hashes()
        lens = offsets[d0 + 1 : d1 + 1] - offsets[d0:d1]
        rows = np.flatnonzero(lens > 0)
        starts = (offsets[d0:d1] - v0)[rows]
        out_rows = rows + d0
        for lo in range(0, nf, _FN_CHUNK):
            hi = min(lo + _FN_CHUNK, nf)
            c = hi - lo
            a = params.A[lo:hi, None]  # (C,1)
            b = params.B[lo:hi, None]
            h = ws.get(c, tm)  # cache-resident scratch, reused everywhere
            np.multiply(vt[None, :], a, out=h)
            np.add(h, b, out=h)
            np.remainder(h, prime, out=h)
            out[out_rows, lo:hi] = np.minimum.reduceat(h, starts, axis=1).T
    return out


def band_hashes(
    offsets: np.ndarray,
    values: np.ndarray,
    params: MinHashParams,
    ws: _Workspace | None = None,
) -> np.ndarray:
    """uint64 (N, L) band-hash matrix; empty docs get the sentinel in every
    band (JaccardLshModel.java:37-38 semantics — see module docstring)."""
    n = len(offsets) - 1
    mins = minhash_matrix(offsets, values, params, ws)  # (N, L*k)
    mins = mins.reshape(n, params.L, params.k)
    # FNV-1a over the sequence [ixL, m_0, .., m_{k-1}] per (doc, table).
    h = np.full((n, params.L), _FNV_OFFSET, dtype=np.uint64)
    table_ix = np.arange(params.L, dtype=np.uint64)[None, :]
    h = (h ^ table_ix) * _FNV_PRIME
    for j in range(params.k):
        h = (h ^ mins[:, :, j]) * _FNV_PRIME
    empty = (offsets[1:] - offsets[:-1]) == 0
    if empty.any():
        h[empty, :] = np.uint64(EMPTY_BAND_SENTINEL)
    return h


def minhash_scalar(shingles: np.ndarray, params: MinHashParams) -> list[tuple[int, ...]]:
    """Scalar transliteration of JaccardLshModel.hash (JaccardLshModel.java:42-63)
    used as the test oracle: returns, per table, the tuple
    ``(ixL, m_0, .., m_{k-1})`` (or the sentinel marker for empty input)."""
    if len(shingles) == 0:
        return [("EMPTY",)] * params.L  # type: ignore[list-item]
    out = []
    for ix_l in range(params.L):
        ints = []
        for ixk in range(params.k):
            a = int(params.A[ix_l * params.k + ixk])
            b = int(params.B[ix_l * params.k + ixk])
            m = min(((1 + int(s) % HASH_PRIME) * a + b) % HASH_PRIME for s in shingles)
            ints.append(m)
        out.append((ix_l, *ints))
    return out

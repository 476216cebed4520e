"""L2 (stable-distribution) and Permutation LSH band stages over embedding
columns — the engine's L2LshModel (no-probe path, L2LshModel.java:70-82) and
PermutationLshModel (PermutationLshModel.java:19-52).

Multiprobe (L2LshModel.java:84-134) is query-side only in the reference; for
symmetric all-pairs dedup it is unnecessary (SURVEY.md §2.1 H4) and is left
to the query path as optional hash expansion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import L2LshConfig, PermutationLshConfig
from elastiknn_ray.models.params import derive_l2
from elastiknn_ray.stages.knn import _to_matrix

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def l2_band_hashes(m: np.ndarray, a: np.ndarray, b: np.ndarray, w: float, L: int, k: int) -> np.ndarray:
    """(N, dims) → (N, L) uint64 band hashes: floor((a·v + b) / w) per hash
    fn (L2LshModel.java:75-80), k per table FNV-mixed with the table index."""
    proj = np.floor((m @ a.T + b[None, :]) / w).astype(np.int64)  # (N, L*k)
    vals = proj.view(np.uint64).reshape(len(m), L, k)
    h = np.full((len(m), L), _FNV_OFFSET, dtype=np.uint64)
    table_ix = np.arange(L, dtype=np.uint64)[None, :]
    h = (h ^ table_ix) * _FNV_PRIME
    for j in range(k):
        h = (h ^ vals[:, :, j]) * _FNV_PRIME
        h = (h ^ (vals[:, :, j] >> np.uint64(32))) * _FNV_PRIME
    return h


class L2LshBandStage:
    """(vec_id, embedding) → exploded (doc_id, band_hash) rows; projections
    re-derived from (config, seed) per actor (ModelCache semantics)."""

    def __init__(self, lsh: L2LshConfig):
        p = derive_l2(lsh)
        self.a = p.A.astype(np.float64)
        self.b = p.B.astype(np.float64)
        self.w = float(lsh.w)
        self.L = lsh.L
        self.k = lsh.k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        bh = l2_band_hashes(m, self.a, self.b, self.w, self.L, self.k)
        ids = batch.column("vec_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.L), pa.int64()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            }
        )


def _fnv_band_scalar(ix_l: int, ints: np.ndarray) -> int:
    """Band identity for one (table, k-int-tuple) — EXACTLY the encoding of
    :func:`l2_band_hashes` so probe hashes collide with corpus bands."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        h = _FNV_OFFSET
        h = (h ^ np.uint64(ix_l)) * _FNV_PRIME
        for v in ints:
            u = np.int64(v).astype(np.int64).view(np.uint64)
            h = (h ^ u) * _FNV_PRIME
            h = (h ^ (u >> np.uint64(32))) * _FNV_PRIME
    return int(h)


def l2_probe_hashes(
    v: np.ndarray, a: np.ndarray, b: np.ndarray, w: float, L: int, k: int, probes: int
) -> np.ndarray:
    """Query-side multiprobe expansion (L2LshModel.java:84-134, after Qin et
    al. 2007): the first L hashes are the unperturbed bands; further hashes
    come from a single global heap of ±1 perturbation sets ordered by summed
    boundary distance, expanded via the reference's shift/expand moves.

    Returns uint64 (L * (1 + min(probes, 3^k - 1)),) band hashes (fewer only
    if the perturbation space exhausts).  Heap ties break deterministically
    by insertion order (the reference's Java heap leaves tie order
    unspecified).
    """
    import heapq

    max_probes = 3**k - 1
    probes = max(0, min(probes, max_probes))
    proj = a @ v + b  # (L*k,)
    hashes = np.floor(proj / w).astype(np.int64)
    out = []
    sorted_perts: list[list[tuple[int, int, float]]] = []  # per table
    for ix_l in range(L):
        ints = hashes[ix_l * k : (ix_l + 1) * k]
        out.append(_fnv_band_scalar(ix_l, ints))
        cands = []
        for ixk in range(k):
            p = proj[ix_l * k + ixk]
            h = hashes[ix_l * k + ixk]
            dneg = p - h * w
            cands.append((ixk, -1, abs(dneg)))
            cands.append((ixk, 1, abs(w - dneg)))
        cands.sort(key=lambda t: t[2])
        sorted_perts.append(cands)
    if probes == 0:
        return np.array(out, dtype=np.uint64)

    # perturbation set = (ix_l, ix_max, members {ixk: delta})
    heap: list = []
    counter = 0

    def push(ix_l, members, ix_max, dist_sum):
        nonlocal counter
        heapq.heappush(heap, (dist_sum, counter, ix_l, ix_max, members))
        counter += 1

    def shift(ix_l, members, ix_max, dist_sum):
        cands = sorted_perts[ix_l]
        if ix_max + 1 == len(cands):
            return None
        cixk, _, cdist = cands[ix_max]
        nixk, ndelta, ndist = cands[ix_max + 1]
        nm = dict(members)
        nm.pop(cixk, None)
        nm[nixk] = ndelta
        ns = dist_sum - cdist + ndist
        if nixk in members and cixk != nixk:
            return shift(ix_l, nm, ix_max + 1, ns)
        return (ix_l, nm, ix_max + 1, ns)

    def expand(ix_l, members, ix_max, dist_sum):
        cands = sorted_perts[ix_l]
        if ix_max + 1 == len(cands):
            return None
        nixk, ndelta, ndist = cands[ix_max + 1]
        nm = dict(members)
        nm[nixk] = ndelta
        ns = dist_sum + ndist
        if nixk in members:
            return shift(ix_l, nm, ix_max + 1, ns)
        return (ix_l, nm, ix_max + 1, ns)

    for ix_l in range(L):
        ixk, delta, dist = sorted_perts[ix_l][0]
        push(ix_l, {ixk: delta}, 0, dist)

    want = L * probes
    while heap and len(out) < L + want:
        dist_sum, _, ix_l, ix_max, members = heapq.heappop(heap)
        for nxt in (
            shift(ix_l, members, ix_max, dist_sum),
            expand(ix_l, members, ix_max, dist_sum),
        ):
            if nxt is not None:
                push(*nxt)
        ints = hashes[ix_l * k : (ix_l + 1) * k].copy()
        for ixk, delta in members.items():
            ints[ixk] += delta
        out.append(_fnv_band_scalar(ix_l, ints))
    return np.array(out, dtype=np.uint64)


def permutation_hashes(m: np.ndarray, k: int, repeating: bool) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k |value| index encoding (PermutationLshModel.java:25-52): per row
    emit the k largest-|value| indices encoded +(ix+1) for values >= 0 and
    -(1+ix) otherwise; with ``repeating``, freq = k - rankComplement where
    tied |values| share the rank of their group's first member (the
    reference's "two-way tie for 2nd place -> no 3rd" rule).

    Tie ORDER among equal |values| is index-ascending here (deterministic);
    the reference's heap emits ties in unspecified-but-deterministic heap
    order — hash/freq multisets agree except when a tie group straddles the
    k cutoff.

    Returns flat (row_ix, hash, freq) arrays (one row per emitted hash).
    """
    n, dims = m.shape
    kk = min(k, dims)
    a = np.abs(m)
    part = np.argpartition(-a, kk - 1, axis=1)[:, :kk]  # (N, kk)
    vals = np.take_along_axis(m, part, axis=1)
    # rank order: |value| desc, index asc (stable sort on index-ordered cols)
    part_sorted = np.sort(part, axis=1)
    vals_sorted = np.take_along_axis(m, part_sorted, axis=1)
    order = np.argsort(-np.abs(vals_sorted), axis=1, kind="stable")
    top = np.take_along_axis(part_sorted, order, axis=1)
    tv = np.take_along_axis(vals_sorted, order, axis=1)
    enc = np.where(tv >= 0, top + 1, -(top + 1)).astype(np.int64)
    if repeating:
        ta = np.abs(tv)
        idx = np.broadcast_to(np.arange(kk), (n, kk))
        boundary = np.concatenate(
            [np.ones((n, 1), dtype=bool), ta[:, 1:] != ta[:, :-1]], axis=1
        )
        first_occ = np.maximum.accumulate(np.where(boundary, idx, 0), axis=1)
        freq = (k - first_occ).astype(np.int64)
    else:
        freq = np.ones((n, kk), np.int64)
    row_ix = np.repeat(np.arange(n), kk)
    return row_ix, enc.reshape(-1), freq.reshape(-1)


#: worker-process model cache (see hashing._MODEL_CACHE)
_MODEL_CACHE: dict = {}


def l2_bands_fn(batch: pa.Table, lsh: L2LshConfig) -> pa.Table:
    """Task-pool variant of L2LshBandStage (projections cached per worker)."""
    stage = _MODEL_CACHE.get(lsh)
    if stage is None:
        stage = L2LshBandStage(lsh)
        _MODEL_CACHE[lsh] = stage
    return stage(batch)


class PermutationLshStage:
    """(vec_id, embedding) → exploded (doc_id, hash, freq) rows."""

    def __init__(self, cfg: PermutationLshConfig):
        self.k = cfg.k
        self.repeating = cfg.repeating

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        row_ix, enc, freq = permutation_hashes(m, self.k, self.repeating)
        return pa.table(
            {
                "doc_id": pa.array(ids[row_ix], pa.int64()),
                "hash": pa.array(enc, pa.int64()),
                "freq": pa.array(freq, pa.int64()),
            }
        )

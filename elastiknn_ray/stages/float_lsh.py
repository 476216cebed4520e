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
from elastiknn_ray.stages.knn import _to_matrix, drop_null_vectors

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
        batch = drop_null_vectors(batch)
        m = _to_matrix(batch.column("embedding"))
        bh = l2_band_hashes(m, self.a, self.b, self.w, self.L, self.k)
        ids = batch.column("vec_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.L), pa.int64()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            }
        )


def _fnv_encode_rows(table_ix: np.ndarray, ints: np.ndarray) -> np.ndarray:
    """Vectorized band identity for (M,) table indices + (M, k) int-tuples —
    EXACTLY the mixing of :func:`l2_band_hashes` so probe hashes collide with
    corpus bands."""
    vals = np.ascontiguousarray(ints, dtype=np.int64).view(np.uint64)
    h = np.full(len(ints), _FNV_OFFSET, dtype=np.uint64)
    h = (h ^ table_ix.astype(np.uint64)) * _FNV_PRIME
    for j in range(vals.shape[1]):
        v = vals[:, j]
        h = (h ^ v) * _FNV_PRIME
        h = (h ^ (v >> np.uint64(32))) * _FNV_PRIME
    return h


def _probe_rows(
    proj: np.ndarray, hashes: np.ndarray, w: float, L: int, k: int, probes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Qin-2007 perturbation-set traversal for ONE query: returns the emitted
    (table_ix, k-int-tuple) rows in heap-pop order (first the L unperturbed
    bands, then up to L*probes perturbed ones).  Hash encoding is deferred to
    the vectorized :func:`_fnv_encode_rows` — this function is pure integer
    bookkeeping around a small heap."""
    import heapq

    hk = hashes.reshape(L, k)
    # candidate perturbations, vectorized: flat slot f = 2*ixk + (delta=+1),
    # matching the original insertion order so stable-sort tie order is
    # preserved (the reference's Java heap leaves tie order unspecified)
    dneg = proj.reshape(L, k) - hk * w
    dist2 = np.empty((L, 2 * k), dtype=np.float64)
    dist2[:, 0::2] = np.abs(dneg)
    dist2[:, 1::2] = np.abs(w - dneg)
    order = np.argsort(dist2, axis=1, kind="stable")
    s_ixk = (order >> 1).tolist()
    s_delta = np.where(order & 1, 1, -1).tolist()
    s_dist = np.take_along_axis(dist2, order, axis=1).tolist()

    n_out = L
    want = L * probes
    ints_out = np.empty((L + want, k), dtype=np.int64)
    ints_out[:L] = hk
    table_out = np.empty(L + want, dtype=np.uint64)
    table_out[:L] = np.arange(L, dtype=np.uint64)

    # perturbation set = (dist_sum, counter, ix_l, ix_max, members {ixk: delta})
    heap: list = []
    counter = 0

    def push(ix_l, members, ix_max, dist_sum):
        nonlocal counter
        heapq.heappush(heap, (dist_sum, counter, ix_l, ix_max, members))
        counter += 1

    def shift(ix_l, members, ix_max, dist_sum):
        if ix_max + 1 == 2 * k:
            return None
        cixk = s_ixk[ix_l][ix_max]
        cdist = s_dist[ix_l][ix_max]
        nixk = s_ixk[ix_l][ix_max + 1]
        nm = dict(members)
        nm.pop(cixk, None)
        nm[nixk] = s_delta[ix_l][ix_max + 1]
        ns = dist_sum - cdist + s_dist[ix_l][ix_max + 1]
        if nixk in members and cixk != nixk:
            return shift(ix_l, nm, ix_max + 1, ns)
        return (ix_l, nm, ix_max + 1, ns)

    def expand(ix_l, members, ix_max, dist_sum):
        if ix_max + 1 == 2 * k:
            return None
        nixk = s_ixk[ix_l][ix_max + 1]
        nm = dict(members)
        nm[nixk] = s_delta[ix_l][ix_max + 1]
        ns = dist_sum + s_dist[ix_l][ix_max + 1]
        if nixk in members:
            return shift(ix_l, nm, ix_max + 1, ns)
        return (ix_l, nm, ix_max + 1, ns)

    for ix_l in range(L):
        push(ix_l, {s_ixk[ix_l][0]: s_delta[ix_l][0]}, 0, s_dist[ix_l][0])

    while heap and n_out < L + want:
        dist_sum, _, ix_l, ix_max, members = heapq.heappop(heap)
        for nxt in (
            shift(ix_l, members, ix_max, dist_sum),
            expand(ix_l, members, ix_max, dist_sum),
        ):
            if nxt is not None:
                push(*nxt)
        row = ints_out[n_out]
        row[:] = hk[ix_l]
        for ixk, delta in members.items():
            row[ixk] += delta
        table_out[n_out] = ix_l
        n_out += 1
    return table_out[:n_out], ints_out[:n_out]


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
    max_probes = 3**k - 1
    probes = max(0, min(probes, max_probes))
    proj = a @ v + b  # (L*k,)
    hashes = np.floor(proj / w).astype(np.int64)
    if probes == 0:
        return _fnv_encode_rows(
            np.arange(L, dtype=np.uint64), hashes.reshape(L, k)
        )
    table_ix, ints = _probe_rows(proj, hashes, w, L, k, probes)
    return _fnv_encode_rows(table_ix, ints)


def l2_probe_hashes_many(
    qm: np.ndarray, a: np.ndarray, b: np.ndarray, w: float, L: int, k: int, probes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-query probe expansion: ONE (Nq, L*k) projection matmul for the
    whole wave, the per-query heap traversal on precomputed rows, and one
    vectorized FNV encode over all emitted hashes.  Returns ragged
    (offsets (Nq+1,), values) — row i's hashes are values[offsets[i]:
    offsets[i+1]], identical to per-query :func:`l2_probe_hashes`."""
    max_probes = 3**k - 1
    probes = max(0, min(probes, max_probes))
    proj_all = qm @ a.T + b[None, :]  # (Nq, L*k)
    hashes_all = np.floor(proj_all / w).astype(np.int64)
    n_q = len(qm)
    if probes == 0:
        vals = _fnv_encode_rows(
            np.tile(np.arange(L, dtype=np.uint64), n_q),
            hashes_all.reshape(n_q * L, k),
        )
        return np.arange(0, (n_q + 1) * L, L, dtype=np.int64), vals
    tables, ints, sizes = [], [], np.empty(n_q, dtype=np.int64)
    for i in range(n_q):
        t, m = _probe_rows(proj_all[i], hashes_all[i], w, L, k, probes)
        tables.append(t)
        ints.append(m)
        sizes[i] = len(t)
    offsets = np.zeros(n_q + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    if n_q == 0:
        return offsets, np.empty(0, np.uint64)
    vals = _fnv_encode_rows(np.concatenate(tables), np.vstack(ints))
    return offsets, vals


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
        batch = drop_null_vectors(batch)
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

"""SimHash signatures + bit-sampling band hashes — the engine's Hamming path
(SURVEY.md §2.1 H2/H7: "SimHash Hamming path mirroring elastiknn's
bit-sampling LSH", north rule).

Two kernels, both vectorized over whole Arrow batches:

1. :func:`simhash_signatures` — Charikar SimHash (public-knowledge algorithm)
   over a document's shingle set: each shingle votes ±1 on each of ``dims``
   bits (its own hash bits, diffused per 64-bit lane); bit = majority sign.
   This produces the doc-level packed bit signature that plays the role of the
   reference's ``Vec.SparseBool`` for the Hamming model.

2. :func:`bitsample_band_hashes` — the reference's HammingLshModel
   (HammingLshModel.java:31-61, 95-127) applied to the packed signature: for
   each of L tables, the k sampled bit positions (drawn exactly like the
   reference via JavaRandom, params.derive_bitsample) are concatenated in
   ascending-position order and mixed with the table index into one uint64
   band identity (same injective-encoding argument as minhash.band_hashes).

Unlike the Jaccard model there is NO empty-vector sentinel: an empty document
has the all-zeros signature and hashes like any other vector, matching the
reference (HammingLshModel hashes the bits that are set; none set → all-zero
bit strings per table).
"""

from __future__ import annotations

import numpy as np

from elastiknn_ray.models.params import BitSampleParams

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def simhash_signatures(
    offsets: np.ndarray, values: np.ndarray, dims: int
) -> np.ndarray:
    """Packed SimHash signatures for N ragged shingle lists.

    ``offsets``: int64 (N+1,); ``values``: uint64 (M,) shingle hashes
    (unique within a doc).  ``dims`` must be a multiple of 64.  Returns
    uint64 (N, dims//64) lane matrix; bit p of doc i is
    ``(out[i, p // 64] >> (p % 64)) & 1``.

    Ties (exactly half the shingles set a bit) resolve to 0 — deterministic
    and partition-invariant since the vote count per bit is a set property.
    """
    assert dims % 64 == 0, "dims must be a multiple of 64"
    lanes = dims // 64
    n = len(offsets) - 1
    out = np.zeros((n, lanes), dtype=np.uint64)
    m = len(values)
    if m == 0:
        return out
    counts = np.diff(offsets)
    # empty docs are EXCLUDED from the reduceat (a clamped start would
    # truncate the preceding doc's segment); their rows stay all-zero
    rows = np.flatnonzero(counts > 0)
    starts = offsets[:-1][rows]
    half = counts[rows, None] / 2.0  # majority threshold per nonempty doc
    for lane in range(lanes):
        lane_hash = _splitmix64(values ^ _U64(0x9E3779B97F4A7C15 * (lane + 1) & 0xFFFFFFFFFFFFFFFF))
        # per-shingle bit matrix (M, 64) via little-endian byte unpack
        bits = np.unpackbits(
            lane_hash.view(np.uint8).reshape(m, 8), axis=1, bitorder="little"
        )
        votes = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
        bit_set = votes > half  # strict majority; tie -> 0
        lane_vals = np.packbits(bit_set.astype(np.uint8), axis=1, bitorder="little")
        out[rows, lane] = lane_vals.view(np.uint64)[:, 0]
    return out


def extract_bits(sig: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Bits at ``positions`` (int64 (k,)) for every row of the uint64 (N, W)
    lane matrix ``sig`` → uint8 (N, k)."""
    lanes = (positions // 64).astype(np.int64)
    shifts = (positions % 64).astype(np.uint64)
    return ((sig[:, lanes] >> shifts[None, :]) & _U64(1)).astype(np.uint8)


def bitsample_band_hashes(sig: np.ndarray, params: BitSampleParams) -> np.ndarray:
    """uint64 (N, L) band-hash matrix from packed signatures.

    Per table the k sampled bits (ascending position order — the reference's
    traversal order, HammingLshModel.java:53-61) are FNV-mixed with the table
    index; identical (table, bit-tuple) → identical band hash, distinct →
    distinct up to ~2^-64.
    """
    n = sig.shape[0]
    out = np.empty((n, params.L), dtype=np.uint64)
    for ix_l in range(params.L):
        bits = extract_bits(sig, params.positions[ix_l])  # (N, k)
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        h = (h ^ _U64(ix_l)) * _FNV_PRIME
        for j in range(bits.shape[1]):
            h = (h ^ bits[:, j].astype(np.uint64)) * _FNV_PRIME
        out[:, ix_l] = h
    return out


def simhash_scalar(shingles: np.ndarray, dims: int) -> np.ndarray:
    """Per-document scalar reference implementation (test oracle)."""
    lanes = dims // 64
    out = np.zeros(lanes, dtype=np.uint64)
    if len(shingles) == 0:
        return out
    for lane in range(lanes):
        votes = np.zeros(64, dtype=np.int64)
        for s in shingles:
            h = _splitmix64(
                np.array(
                    [int(s) ^ (0x9E3779B97F4A7C15 * (lane + 1) & 0xFFFFFFFFFFFFFFFF)],
                    dtype=np.uint64,
                )
            )[0]
            for b in range(64):
                votes[b] += (int(h) >> b) & 1
        acc = 0
        for b in range(64):
            if votes[b] * 2 > len(shingles):
                acc |= 1 << b
        out[lane] = acc
    return out

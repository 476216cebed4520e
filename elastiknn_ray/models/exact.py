"""Exact similarity kernels — the engine's ExactModel
(elastiknn-models/.../ExactModel.java:10-38) vectorized over batches of pairs.

Set similarities operate on sorted-unique ID arrays (the reference's
sorted-trueIndices invariant, VectorMapper.scala:31); the intersection count
is the sorted-merge count of BooleanVectorOps.java:15-31, computed here for a
whole pair batch at once via one lexsort over (pair_id, value) instead of a
per-pair merge loop.

Score conventions follow the reference exactly (score table
docs/pages/api.md:444-450): jaccard/hamming in [0,1] with 0/0-Jaccard = 1
(ExactModel.java:13); cosine score = 1 + cos in [0,2]; l1/l2 score =
1/(1+dist).
"""

from __future__ import annotations

import numpy as np


def pair_intersection_counts(
    a_offsets: np.ndarray,
    a_values: np.ndarray,
    b_offsets: np.ndarray,
    b_values: np.ndarray,
) -> np.ndarray:
    """Intersection sizes for N pairs of sorted-unique uint64 sets.

    Pair i is ``a_values[a_offsets[i]:a_offsets[i+1]]`` vs the matching b
    slice.  Values must be unique within each list (not necessarily sorted).
    Fully vectorized: tag every element with its pair id, sort by (pair,
    value), count adjacent equal values within a pair.
    """
    n = len(a_offsets) - 1
    a_len = np.diff(a_offsets)
    b_len = np.diff(b_offsets)
    vals = np.concatenate([a_values, b_values])
    pids = np.concatenate(
        [np.repeat(np.arange(n), a_len), np.repeat(np.arange(n), b_len)]
    )
    if len(vals) == 0:
        return np.zeros(n, dtype=np.int64)
    order = np.lexsort((vals, pids))
    v = vals[order]
    p = pids[order]
    dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    return np.bincount(p[1:][dup], minlength=n).astype(np.int64)


def jaccard_similarity(
    a_offsets: np.ndarray,
    a_values: np.ndarray,
    b_offsets: np.ndarray,
    b_values: np.ndarray,
) -> np.ndarray:
    """Exact Jaccard per pair: isec / (|A|+|B|-isec); 0/0 = 1
    (ExactModel.java:10-16)."""
    isec = pair_intersection_counts(a_offsets, a_values, b_offsets, b_values)
    denom = np.diff(a_offsets) + np.diff(b_offsets) - isec
    out = np.ones(len(isec), dtype=np.float64)  # 0/0 case
    nz = denom > 0
    out[nz] = isec[nz] / denom[nz]
    return out


def hamming_similarity(
    a_offsets: np.ndarray,
    a_values: np.ndarray,
    b_offsets: np.ndarray,
    b_values: np.ndarray,
    total_indices: int,
) -> np.ndarray:
    """Exact Hamming similarity on sparse-bool sets (ExactModel.java:19-23)."""
    isec = pair_intersection_counts(a_offsets, a_values, b_offsets, b_values)
    neq = np.maximum(np.diff(a_offsets) - isec, 0) + np.maximum(
        np.diff(b_offsets) - isec, 0
    )
    return (total_indices - neq) / float(total_indices)


def hamming_similarity_packed(sig_a: np.ndarray, sig_b: np.ndarray, dims: int) -> np.ndarray:
    """Hamming similarity over packed bit signatures: sig_* are uint64 (N, W)
    lane matrices; similarity = (dims - popcount(xor)) / dims.  The packed
    fast path for SimHash signatures (H7 in SURVEY.md §2.1)."""
    x = np.atleast_2d(sig_a ^ sig_b)
    # vectorized popcount: unpack the uint64 lanes to bits and sum per row
    diff = (
        np.unpackbits(x.view(np.uint8).reshape(x.shape[0], -1), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )
    return (dims - diff) / float(dims)


def cosine_similarity_pairs(va: np.ndarray, vb: np.ndarray) -> np.ndarray:
    """Reference cosine *score* = 1 + cos(va_i, vb_i) per matched row pair
    (ExactModel.java:36-38; DefaultFloatVectorOps.java cosine with the
    zero-norm guard → cos 0 when either norm is 0)."""
    dot = np.einsum("ij,ij->i", va, vb)
    na = np.einsum("ij,ij->i", va, va)
    nb = np.einsum("ij,ij->i", vb, vb)
    denom = np.sqrt(na * nb)
    cos = np.divide(dot, denom, out=np.zeros_like(dot), where=denom > 0)
    return 1.0 + cos


def l2_similarity_pairs(va: np.ndarray, vb: np.ndarray) -> np.ndarray:
    """1 / (1 + l2dist) (ExactModel.java:26-28)."""
    d = va - vb
    return 1.0 / (1.0 + np.sqrt(np.einsum("ij,ij->i", d, d)))


def l1_similarity_pairs(va: np.ndarray, vb: np.ndarray) -> np.ndarray:
    """1 / (1 + l1dist) (ExactModel.java:31-33)."""
    return 1.0 / (1.0 + np.abs(va - vb).sum(axis=1))


def cosine_scores_matrix(corpus: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """(n_queries, n_corpus) reference cosine scores via one matmul — the
    brute-force kNN path (ExactQuery.scala:18-50 semantics, batched)."""
    qn = np.linalg.norm(queries, axis=1, keepdims=True)
    cn = np.linalg.norm(corpus, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    cn[cn == 0] = 1.0
    return 1.0 + (queries / qn) @ (corpus / cn).T

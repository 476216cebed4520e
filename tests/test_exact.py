"""Exact-similarity kernels vs naive references — the
ExactSimilarityFunctionSuite pattern (SURVEY.md §5.2: 1000 random pairs,
tolerance 1e-7, plus edge cases incl. both-empty Jaccard = 1)."""

import numpy as np
import pytest

from elastiknn_ray.models import exact


def _naive_jaccard(a, b):
    sa, sb = set(a.tolist()), set(b.tolist())
    isec = len(sa & sb)
    denom = len(sa) + len(sb) - isec
    if isec == 0 and denom == 0:
        return 1.0
    return isec / denom if denom > 0 else 0.0


def _make_pairs(rng, n_pairs, universe, max_len):
    a_off = [0]
    b_off = [0]
    a_vals, b_vals = [], []
    for _ in range(n_pairs):
        la, lb = rng.integers(0, max_len, 2)
        a = rng.choice(universe, la, replace=False).astype(np.uint64)
        b = rng.choice(universe, lb, replace=False).astype(np.uint64)
        a_vals.append(np.sort(a))
        b_vals.append(np.sort(b))
        a_off.append(a_off[-1] + la)
        b_off.append(b_off[-1] + lb)
    return (
        np.array(a_off, dtype=np.int64),
        np.concatenate(a_vals) if a_vals else np.empty(0, np.uint64),
        np.array(b_off, dtype=np.int64),
        np.concatenate(b_vals) if b_vals else np.empty(0, np.uint64),
    )


def test_jaccard_vs_naive_1000_pairs():
    rng = np.random.default_rng(0)
    ao, av, bo, bv = _make_pairs(rng, 1000, 500, 60)
    j = exact.jaccard_similarity(ao, av, bo, bv)
    for i in range(1000):
        expect = _naive_jaccard(av[ao[i] : ao[i + 1]], bv[bo[i] : bo[i + 1]])
        assert abs(j[i] - expect) < 1e-7


def test_jaccard_both_empty_is_one():
    """ExactModel.java:13 — 0/0 defined as 1."""
    ao = np.array([0, 0], np.int64)
    bo = np.array([0, 0], np.int64)
    j = exact.jaccard_similarity(ao, np.empty(0, np.uint64), bo, np.empty(0, np.uint64))
    assert j[0] == 1.0


def test_jaccard_one_empty_is_zero():
    ao = np.array([0, 2], np.int64)
    bo = np.array([0, 0], np.int64)
    j = exact.jaccard_similarity(
        ao, np.array([1, 2], np.uint64), bo, np.empty(0, np.uint64)
    )
    assert j[0] == 0.0


def test_hamming_sparse_vs_naive():
    rng = np.random.default_rng(1)
    total = 256
    for _ in range(100):
        la, lb = rng.integers(0, 64, 2)
        a = np.sort(rng.choice(total, la, replace=False).astype(np.uint64))
        b = np.sort(rng.choice(total, lb, replace=False).astype(np.uint64))
        ao = np.array([0, la], np.int64)
        bo = np.array([0, lb], np.int64)
        h = exact.hamming_similarity(ao, a, bo, b, total)[0]
        va = np.zeros(total, bool)
        va[a.astype(int)] = True
        vb = np.zeros(total, bool)
        vb[b.astype(int)] = True
        assert abs(h - (va == vb).mean()) < 1e-9


def test_hamming_packed_vs_sparse():
    rng = np.random.default_rng(2)
    dims = 128
    bits_a = rng.random((50, dims)) < 0.5
    bits_b = rng.random((50, dims)) < 0.5
    sig_a = np.packbits(bits_a, axis=1).view(np.uint64)
    sig_b = np.packbits(bits_b, axis=1).view(np.uint64)
    h = exact.hamming_similarity_packed(sig_a, sig_b, dims)
    expect = (bits_a == bits_b).mean(axis=1)
    assert np.allclose(h, expect)


def test_dense_similarity_scores():
    """Score conventions: cosine = 1+cos ∈ [0,2]; l1/l2 = 1/(1+dist)
    (ExactModel.java:26-38, docs/pages/api.md:444-450)."""
    rng = np.random.default_rng(3)
    va = rng.normal(size=(100, 16))
    vb = rng.normal(size=(100, 16))
    cos = exact.cosine_similarity_pairs(va, vb)
    assert ((cos >= 0) & (cos <= 2)).all()
    same = exact.cosine_similarity_pairs(va, va * 3.0)
    assert np.allclose(same, 2.0)
    l2 = exact.l2_similarity_pairs(va, vb)
    expect = 1.0 / (1.0 + np.linalg.norm(va - vb, axis=1))
    assert np.allclose(l2, expect)
    l1 = exact.l1_similarity_pairs(va, vb)
    expect1 = 1.0 / (1.0 + np.abs(va - vb).sum(axis=1))
    assert np.allclose(l1, expect1)


def test_cosine_zero_norm_guard():
    va = np.zeros((1, 4))
    vb = np.ones((1, 4))
    assert exact.cosine_similarity_pairs(va, vb)[0] == 1.0  # cos treated as 0


def test_cosine_scores_matrix_matches_pairs():
    rng = np.random.default_rng(4)
    corpus = rng.normal(size=(30, 8))
    queries = rng.normal(size=(5, 8))
    m = exact.cosine_scores_matrix(corpus, queries)
    for qi in range(5):
        expect = exact.cosine_similarity_pairs(
            np.repeat(queries[qi : qi + 1], 30, axis=0), corpus
        )
        assert np.allclose(m[qi], expect)

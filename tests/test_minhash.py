"""MinHash kernel properties, mirroring the reference's kernel unit suites
(SURVEY.md §5.1: shape/count properties, batched-vs-scalar oracle)."""

import numpy as np
import pytest

from elastiknn_ray.config import EMPTY_BAND_SENTINEL, HASH_PRIME, JaccardLshConfig
from elastiknn_ray.models.minhash import band_hashes, minhash_matrix, minhash_scalar
from elastiknn_ray.models.params import derive_minhash


@pytest.fixture(scope="module")
def params():
    return derive_minhash(JaccardLshConfig(L=8, k=3, seed=0))


def _ragged(rng, n_docs, max_len):
    lens = rng.integers(0, max_len, n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = rng.integers(0, 2**63, int(offsets[-1])).astype(np.uint64)
    return offsets, values


def test_batched_equals_scalar_reference(params):
    """The vectorized kernel must match the scalar transliteration of
    JaccardLshModel.hash (JaccardLshModel.java:42-63) exactly."""
    rng = np.random.default_rng(0)
    offsets, values = _ragged(rng, 50, 40)
    mm = minhash_matrix(offsets, values, params)
    for d in range(50):
        seg = values[offsets[d] : offsets[d + 1]]
        if len(seg) == 0:
            continue
        expected = minhash_scalar(seg, params)
        for ix_l in range(params.L):
            assert expected[ix_l][0] == ix_l
            for ixk in range(params.k):
                assert mm[d, ix_l * params.k + ixk] == expected[ix_l][1 + ixk]


def test_param_derivation_matches_reference_draw_order():
    """A then B, each L*k draws of nextInt(HASH_PRIME-1)
    (JaccardLshModel.java:31-38)."""
    from elastiknn_ray.java_random import JavaRandom

    p = derive_minhash(JaccardLshConfig(L=2, k=2, seed=0))
    r = JavaRandom(0)
    expect_a = [r.next_int(HASH_PRIME - 1) for _ in range(4)]
    expect_b = [r.next_int(HASH_PRIME - 1) for _ in range(4)]
    assert p.A.tolist() == expect_a
    assert p.B.tolist() == expect_b


def test_band_count_per_doc(params):
    """L band hashes per non-empty doc (JaccardLshSuite-style shape check)."""
    rng = np.random.default_rng(1)
    offsets, values = _ragged(rng, 20, 30)
    bh = band_hashes(offsets, values, params)
    assert bh.shape == (20, params.L)


def test_empty_doc_sentinel(params):
    """Empty vectors hash to one universal sentinel — colliding with every
    empty vector and nothing else (JaccardLshModel.java:37-38)."""
    offsets = np.array([0, 0, 3, 3], dtype=np.int64)
    values = np.array([5, 9, 11], dtype=np.uint64)
    bh = band_hashes(offsets, values, params)
    assert (bh[0] == np.uint64(EMPTY_BAND_SENTINEL)).all()
    assert (bh[2] == np.uint64(EMPTY_BAND_SENTINEL)).all()
    assert not (bh[1] == np.uint64(EMPTY_BAND_SENTINEL)).any()


def test_identical_sets_identical_bands(params):
    vals = np.array([3, 77, 2**62], dtype=np.uint64)
    offsets = np.array([0, 3, 6], dtype=np.int64)
    bh = band_hashes(offsets, np.concatenate([vals, vals]), params)
    assert (bh[0] == bh[1]).all()


def test_band_tables_differ(params):
    """Different tables produce different band hashes for the same doc (the
    table index is mixed into the band identity — writeIntsWithPrefix
    semantics, JaccardLshModel.java:59)."""
    rng = np.random.default_rng(2)
    offsets = np.array([0, 20], dtype=np.int64)
    values = rng.integers(0, 2**63, 20).astype(np.uint64)
    bh = band_hashes(offsets, values, params)
    assert len(np.unique(bh[0])) > 1


def test_collision_probability_tracks_jaccard():
    """MinHash property: P[one-table collision] ≈ J^k — the estimator the
    reference's proportional score mode exposes (HashingQuery.scala:40-43)."""
    cfg = JaccardLshConfig(L=64, k=1, seed=0)
    p = derive_minhash(cfg)
    rng = np.random.default_rng(3)
    base = rng.choice(2**62, 200, replace=False).astype(np.uint64)
    a = base[:150]  # |A|=150
    b = base[50:]  # |B|=150, |A∩B|=100, |A∪B|=200 → J=0.5
    offsets = np.array([0, len(a), len(a) + len(b)], dtype=np.int64)
    bh = band_hashes(offsets, np.concatenate([a, b]), p)
    frac = (bh[0] == bh[1]).mean()
    assert abs(frac - 0.5) < 0.15

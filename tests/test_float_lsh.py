"""L2-LSH + Permutation-LSH kernel tests mirroring the reference suites
(L2LshSuite.scala shape properties, PermutationLshModelSuite.scala examples)."""

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import L2LshConfig
from elastiknn_ray.models.params import derive_l2
from elastiknn_ray.stages.float_lsh import l2_band_hashes, permutation_hashes


def test_l2_exactly_L_hashes_and_deterministic():
    cfg = L2LshConfig(dims=16, L=10, k=3, w=4, seed=0)
    p = derive_l2(cfg)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(7, 16))
    h1 = l2_band_hashes(v, p.A.astype(np.float64), p.B.astype(np.float64), cfg.w, cfg.L, cfg.k)
    p2 = derive_l2(cfg)
    h2 = l2_band_hashes(v, p2.A.astype(np.float64), p2.B.astype(np.float64), cfg.w, cfg.L, cfg.k)
    assert h1.shape == (7, 10)
    assert (h1 == h2).all()


def test_l2_nearby_vectors_collide_more():
    cfg = L2LshConfig(dims=8, L=32, k=2, w=10, seed=0)
    p = derive_l2(cfg)
    rng = np.random.default_rng(1)
    a = rng.normal(size=8)
    near = a + 0.01 * rng.normal(size=8)
    far = rng.normal(size=8) * 10
    h = l2_band_hashes(
        np.vstack([a, near, far]),
        p.A.astype(np.float64), p.B.astype(np.float64), cfg.w, cfg.L, cfg.k,
    )
    n_near = (h[0] == h[1]).sum()
    n_far = (h[0] == h[2]).sum()
    assert n_near > n_far
    assert n_near >= 24  # 0.01 perturbation at w=10: near-certain collision


def _perm(vec, k, repeating):
    row, enc, freq = permutation_hashes(np.array([vec], dtype=np.float64), k, repeating)
    return sorted(zip(enc.tolist(), freq.tolist()))


def test_permutation_example_from_paper():
    # PermutationLshModelSuite.scala:13-19
    assert _perm([0.1, -0.3, -0.4, 0, 0.2], 4, True) == sorted(
        [(-3, 4), (-2, 3), (5, 2), (1, 1)]
    )


def test_permutation_example_no_repetition():
    # PermutationLshModelSuite.scala:21-27
    assert _perm([0.1, -0.3, -0.4, 0, 0.2], 4, False) == sorted(
        [(-3, 1), (-2, 1), (5, 1), (1, 1)]
    )


def test_permutation_another_example():
    # PermutationLshModelSuite.scala:29-38
    assert _perm([10, -2, 0, 99, 0.1, -8, 42, -13, 6, 0.1], 4, True) == sorted(
        [(4, 4), (7, 3), (-8, 2), (1, 1)]
    )


def test_permutation_ties():
    # PermutationLshModelSuite.scala:40-46 — tied indices share freq, the
    # following rank is reduced
    assert _perm([2, 2, 0, 0, 1, 4], 4, True) == sorted(
        [(6, 4), (1, 3), (2, 3), (5, 1)]
    )


def test_permutation_magnitude_invariant():
    rng = np.random.default_rng(2)
    v = rng.normal(size=10)
    assert _perm(v, 5, True) == _perm(v * 3.7, 5, True)


def _l2_params(dims, L, k, w, seed=0):
    cfg = L2LshConfig(dims=dims, L=L, k=k, w=w, seed=seed)
    p = derive_l2(cfg)
    return p.A.astype(np.float64), p.B.astype(np.float64)


def test_l2_probe_hash_counts():
    """L2LshSuite 'produces exactly L * (probes + 1) hashes' (clamped at
    3^k - 1 probes) — L2LshSuite.scala:23-37."""
    from elastiknn_ray.stages.float_lsh import l2_probe_hashes

    rng = np.random.default_rng(0)
    v = rng.normal(size=20)
    for L in (1, 3, 7):
        for k in (1, 2, 3):
            a, b = _l2_params(20, L, k, 1)
            max_k = 3**k - 1
            for p in range(0, max_k + 3):
                h = l2_probe_hashes(v, a, b, 1.0, L, k, p)
                assert len(h) == L * (1 + min(p, max_k)), (L, k, p)


def test_l2_probe_first_L_match_no_probe():
    """L2LshSuite 'first L hashes are the same with and without probing'."""
    from elastiknn_ray.stages.float_lsh import l2_probe_hashes

    rng = np.random.default_rng(1)
    v = rng.normal(size=32)
    a, b = _l2_params(32, 10, 3, 1)
    h0 = l2_probe_hashes(v, a, b, 1.0, 10, 3, 0)
    h3 = l2_probe_hashes(v, a, b, 1.0, 10, 3, 3)
    assert len(h0) == 10
    assert (h3[:10] == h0).all()
    # probe hashes collide with the batch kernel's band identities
    batch = l2_band_hashes(v[None, :], a, b, 1.0, 10, 3)[0]
    assert (h0 == batch).all()


def test_l2_probe_hits_neighbor_buckets():
    """A vector just across a bucket boundary is reachable via probing."""
    from elastiknn_ray.stages.float_lsh import l2_probe_hashes

    rng = np.random.default_rng(2)
    v = rng.normal(size=16)
    near = v + 0.05 * rng.normal(size=16)
    a, b = _l2_params(16, 8, 2, 1)
    hv = set(l2_probe_hashes(v, a, b, 1.0, 8, 2, 8).tolist())
    hn = set(l2_probe_hashes(near, a, b, 1.0, 8, 2, 0).tolist())
    base_overlap = len(set(l2_probe_hashes(v, a, b, 1.0, 8, 2, 0).tolist()) & hn)
    assert len(hv & hn) >= base_overlap
    assert len(hv & hn) > 0

"""JavaRandom must reproduce java.util.Random bit-for-bit — the reference
derives all LSH parameters from ``new Random(0)`` (ModelCache.scala:17-21)."""

from elastiknn_ray.java_random import JavaRandom


def _next_int32(r: JavaRandom) -> int:
    v = r._next(32)
    return v - (1 << 32) if v >= (1 << 31) else v


def test_next_int_golden_seed0():
    # Widely published java.util.Random golden values.
    r = JavaRandom(0)
    assert _next_int32(r) == -1155484576
    assert _next_int32(r) == -723955400


def test_next_int_golden_seed42():
    r = JavaRandom(42)
    assert _next_int32(r) == -1170105035


def test_next_int_bound_range_and_determinism():
    r1 = JavaRandom(0)
    r2 = JavaRandom(0)
    xs = [r1.next_int(2038074742) for _ in range(1000)]
    ys = [r2.next_int(2038074742) for _ in range(1000)]
    assert xs == ys
    assert all(0 <= x < 2038074742 for x in xs)


def test_next_gaussian_properties():
    r = JavaRandom(0)
    xs = [r.next_gaussian() for _ in range(10000)]
    mean = sum(xs) / len(xs)
    var = sum((x - mean) ** 2 for x in xs) / len(xs)
    assert abs(mean) < 0.05
    assert abs(var - 1.0) < 0.1


def test_next_float_range():
    r = JavaRandom(7)
    xs = [r.next_float() for _ in range(1000)]
    assert all(0.0 <= x < 1.0 for x in xs)


def test_bulk_gaussians_bit_exact_vs_scalar():
    """next_gaussians(n) must be indistinguishable from n scalar calls —
    same values, same final LCG state, same cached second gaussian — for
    every parity/chunking regime (the bulk path powers derive_l2 /
    derive_hyperplanes, whose Java-pinned draws must not move)."""
    import numpy as np

    for seed in (0, 1, 42, 2**31, -7):
        for n in (1, 2, 3, 17, 1000, 9601):
            r_sc = JavaRandom(seed)
            sc = np.array([r_sc.next_gaussian() for _ in range(n)])
            r_bl = JavaRandom(seed)
            bl = r_bl.next_gaussians(n)
            assert np.array_equal(sc, bl)
            # state + gaussian-cache equivalence: the NEXT draws agree too
            assert r_sc.next_double() == r_bl.next_double()
            assert r_sc.next_gaussian() == r_bl.next_gaussian()


def test_bulk_gaussians_interleave_with_scalar():
    import numpy as np

    r1, r2 = JavaRandom(0), JavaRandom(0)
    a = [r1.next_gaussian() for _ in range(5)]
    b = list(r2.next_gaussians(3)) + [r2.next_gaussian(), r2.next_gaussian()]
    assert a == b
    assert list(r1.next_gaussians(7)) == [r2.next_gaussian() for _ in range(7)]
    assert np.array_equal(r1.next_gaussians(0), np.empty(0))


def test_derive_model_cache_memoizes_and_freezes():
    """derive_* results are memoized per config (ModelCache.scala:10-27
    semantics) and the shared arrays are read-only."""
    import numpy as np
    import pytest

    from elastiknn_ray.config import L2LshConfig
    from elastiknn_ray.models.params import derive_l2

    cfg = L2LshConfig(dims=8, L=3, k=2, w=4, seed=0)
    p1 = derive_l2(cfg)
    p2 = derive_l2(L2LshConfig(dims=8, L=3, k=2, w=4, seed=0))
    assert p1 is p2
    with pytest.raises(ValueError):
        p1.A[0, 0] = 0.0
    # derivation itself still matches the scalar JavaRandom stream
    r = JavaRandom(0)
    a_old = np.array(
        [np.float32(r.next_gaussian()) for _ in range(3 * 2 * 8)], np.float32
    ).reshape(6, 8)
    assert np.array_equal(p1.A, a_old)
    b_old = np.array(
        [np.float32(r.next_float()) * 4 for _ in range(6)], np.float32
    )
    assert np.array_equal(p1.B, b_old)

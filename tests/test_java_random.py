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

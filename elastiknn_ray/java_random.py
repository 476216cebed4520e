"""Transliteration of ``java.util.Random`` (the 48-bit LCG specified in the
public Java SE Javadoc for java.util.Random).

The reference derives every LSH model's parameters from ``new Random(0)``
(elastiknn-plugin/.../ModelCache.scala:17-21; rationale in
docs/pages/internals.md:15-24: parameters are never stored, always re-derived
from the seed).  Reproducing the exact generator means our derived MinHash
coefficients / hyperplanes / sampled bit positions are *identical* to the
reference's at the same (config, seed), which is the strongest possible footing
for "cluster assignments must match the reference at the same configuration".

Only the methods the reference models use are implemented: nextInt(bound),
nextFloat, nextDouble, nextGaussian.
"""

from __future__ import annotations

import math

import numpy as np

_MULT = 0x5DEECE66D
_ADD = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """java.util.Random-compatible PRNG (48-bit LCG per the Javadoc spec)."""

    def __init__(self, seed: int = 0) -> None:
        self._seed = (seed ^ _MULT) & _MASK
        self._next_gaussian: float | None = None

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULT + _ADD) & _MASK
        return self._seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java rejects when bits - val + (bound - 1) overflows int32.
            if bits - val + (bound - 1) < (1 << 31):
                return val

    def next_float(self) -> float:
        return self._next(24) / float(1 << 24)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) / float(1 << 53)

    def next_gaussian(self) -> float:
        # Marsaglia polar method, exactly as in the Javadoc reference code.
        if self._next_gaussian is not None:
            g = self._next_gaussian
            self._next_gaussian = None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        multiplier = math.sqrt(-2 * math.log(s) / s)
        self._next_gaussian = v2 * multiplier
        return v1 * multiplier

    # ---------------------------------------------------------- bulk draws

    def _peek_states(self, n: int) -> np.ndarray:
        """The next ``n`` LCG states WITHOUT advancing the generator.

        s_i = (M^i * s_0 + ADD * sum_{j<i} M^j) mod 2^48, computed fully
        vectorized in uint64: products/sums wrap mod 2^64 and 2^48 divides
        2^64, so masking at the end is congruent mod 2^48.
        """
        powers = np.multiply.accumulate(np.full(n, _MULT, dtype=np.uint64))
        geo = np.cumsum(
            np.concatenate(([np.uint64(1)], powers[:-1])), dtype=np.uint64
        )
        return (
            powers * np.uint64(self._seed) + np.uint64(_ADD) * geo
        ) & np.uint64(_MASK)

    def next_gaussians(self, n: int) -> np.ndarray:
        """``n`` draws identical to ``n`` calls of :meth:`next_gaussian`,
        vectorized (~100x): the LCG state sequence is closed-form (see
        :meth:`_peek_states`), doubles are paired, the polar-method
        acceptance test is a mask, and only the states the scalar path
        would actually consume are committed — interleaving bulk and
        scalar calls yields the same stream either way."""
        out = np.empty(n, dtype=np.float64)
        filled = 0
        if n and self._next_gaussian is not None:
            out[0] = self._next_gaussian
            self._next_gaussian = None
            filled = 1
        need = n - filled  # gaussians still to produce
        pos = filled
        while need > 0:
            want_pairs = (need + 1) // 2
            # acceptance rate is pi/4; 1/0.72 overdraw usually finishes in
            # one chunk, and overdrawn states are never committed
            n_pairs = max(64, int(want_pairs / 0.72) + 8)
            states = self._peek_states(4 * n_pairs)
            hi = (states[0::2] >> np.uint64(22)).astype(np.float64)
            lo = (states[1::2] >> np.uint64(21)).astype(np.float64)
            d = (hi * float(1 << 27) + lo) / float(1 << 53)
            v1 = 2.0 * d[0::2] - 1.0
            v2 = 2.0 * d[1::2] - 1.0
            s = v1 * v1 + v2 * v2
            acc = np.flatnonzero((s > 0.0) & (s < 1.0))
            take = acc[:want_pairs]
            if len(take):
                sa = s[take]
                # math.log, not np.log: numpy's SIMD log differs from libm
                # by 1 ulp on some inputs, and the Java pin is on libm
                # (np.sqrt is IEEE correctly-rounded, so it stays vector)
                lg = np.fromiter(
                    map(math.log, sa.tolist()), np.float64, len(sa)
                )
                mult = np.sqrt(-2.0 * lg / sa)
                g = np.empty(2 * len(take), dtype=np.float64)
                g[0::2] = v1[take] * mult
                g[1::2] = v2[take] * mult
                emit = min(len(g), need)
                out[pos : pos + emit] = g[:emit]
                if emit < len(g):  # odd tail: cache the pair's second half
                    self._next_gaussian = float(g[emit])
                pos += emit
                need -= emit
            if len(acc) >= want_pairs:
                # commit exactly through the last consumed pair's 4 states
                self._seed = int(states[4 * (int(take[-1]) + 1) - 1])
            else:
                self._seed = int(states[-1])  # chunk exhausted; loop
        return out

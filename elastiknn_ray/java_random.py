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

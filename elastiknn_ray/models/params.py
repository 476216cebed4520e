"""Derivation of LSH model parameters from ``(config, seed)``.

This is the engine's ModelCache (elastiknn-plugin/.../ModelCache.scala:10-27):
parameters are deterministic functions of the config and are re-derived once
per worker/actor (`__init__`), never stored or shipped.  The random draws
reproduce the reference's ``new java.util.Random(seed)`` sequence exactly via
:class:`elastiknn_ray.java_random.JavaRandom`, so at the same (L, k, dims, w,
seed) our coefficients/planes/sampled positions equal the reference's.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from elastiknn_ray.config import (
    HASH_PRIME,
    CosineLshConfig,
    HammingLshConfig,
    JaccardLshConfig,
    L2LshConfig,
)
from elastiknn_ray.java_random import JavaRandom


@dataclass(frozen=True)
class MinHashParams:
    """A, B: (L*k,) coefficients of h_i(x) = ((1+x)*A_i + B_i) mod HASH_PRIME.

    Drawn exactly as JaccardLshModel.java:31-38: all A first, then all B,
    each ``rng.nextInt(HASH_PRIME - 1)``.
    """

    L: int
    k: int
    A: np.ndarray  # uint64 (L*k,)
    B: np.ndarray  # uint64 (L*k,)


def _model_cache(fn):
    """Process-level memo of derived params keyed by the (frozen, hashable)
    config — the engine's ModelCache (ModelCache.scala:10-27 caches the
    derived model per mapping for exactly this reason: derivation replays
    the seeded JavaRandom stream, which is inherently sequential and was
    the dominant per-query-wave cost on repeat calls).  Safe to share: the
    param dataclasses are frozen and every array is marked read-only."""

    @functools.lru_cache(maxsize=None)
    def cached(cfg):
        params = fn(cfg)
        for v in vars(params).values():
            if isinstance(v, np.ndarray):
                v.setflags(write=False)
        return params

    return functools.wraps(fn)(cached)


@_model_cache
def derive_minhash(cfg: JaccardLshConfig) -> MinHashParams:
    rng = JavaRandom(cfg.seed)
    n = cfg.L * cfg.k
    a = np.array([rng.next_int(HASH_PRIME - 1) for _ in range(n)], dtype=np.uint64)
    b = np.array([rng.next_int(HASH_PRIME - 1) for _ in range(n)], dtype=np.uint64)
    return MinHashParams(cfg.L, cfg.k, a, b)


@dataclass(frozen=True)
class BitSampleParams:
    """For each of L tables, the k sampled bit positions (in sample order).

    Mirrors HammingLshModel.java:36-48: one global no-replacement sample of
    L*k positions when ``L*k <= dims`` (position i feeds table ``i % L``),
    else an independent k-sample per table.  ``positions[ixL]`` lists the
    table's sampled vector indices in the order they contribute bits — the
    reference appends bits in ascending *vector index* order (positions are
    globally sorted by vecIndex before hashing, HammingLshModel.java:53-61),
    so we store each table's positions sorted ascending with the bit
    significance matching that traversal (first-visited position = leftmost
    bit appended).
    """

    dims: int
    L: int
    k: int
    positions: np.ndarray  # int64 (L, k) — each row sorted ascending


@_model_cache
def derive_bitsample(cfg: HammingLshConfig) -> BitSampleParams:
    rng = JavaRandom(cfg.seed)
    L, k, dims = cfg.L, cfg.k, cfg.dims
    if k > dims:
        # the per-table sampler can only return min(k, dims) distinct
        # positions; ragged tables would break the (L, k) position matrix
        raise ValueError(
            f"HammingLshConfig: k={k} bits per table cannot exceed dims={dims}"
        )

    def sample_no_replacement(n: int, max_: int) -> list[int]:
        # HammingLshModel.java:81-92 — rejection sampling preserving draw order.
        seen: set[int] = set()
        out: list[int] = []
        while len(seen) < min(n, max_):
            nxt = rng.next_int(max_)
            if nxt not in seen:
                out.append(nxt)
                seen.add(nxt)
        return out

    # (vec index, table) pairs exactly as the reference constructor.
    pairs: list[tuple[int, int]] = []
    if L * k <= dims:
        samp = sample_no_replacement(L * k, dims)
        for i in range(L * k):
            pairs.append((samp[i], i % L))
    else:
        for ix_l in range(L):
            samp = sample_no_replacement(k, dims)
            for ixk in range(k):
                pairs.append((samp[ixk], ix_l))

    # The reference sorts sampled positions by vecIndex and appends bits in
    # that traversal order (HammingLshModel.java:53-61, 95-127).  Within one
    # table each position contributes one bit, so a table's bit string is its
    # positions' membership bits in ascending-position order.
    per_table: list[list[int]] = [[] for _ in range(L)]
    for vec_ix, ix_l in sorted(pairs, key=lambda p: p[0]):
        per_table[ix_l].append(vec_ix)
    positions = np.array(per_table, dtype=np.int64)
    return BitSampleParams(dims, L, k, positions)


@dataclass(frozen=True)
class HyperplaneParams:
    """planes: (L*k, dims) Gaussian hyperplanes (CosineLshModel.java:30-37)."""

    dims: int
    L: int
    k: int
    planes: np.ndarray  # float32 (L*k, dims)


@_model_cache
def derive_hyperplanes(cfg: CosineLshConfig) -> HyperplaneParams:
    rng = JavaRandom(cfg.seed)
    planes = (
        rng.next_gaussians(cfg.L * cfg.k * cfg.dims)
        .astype(np.float32)
        .reshape(cfg.L * cfg.k, cfg.dims)
    )
    return HyperplaneParams(cfg.dims, cfg.L, cfg.k, planes)


@dataclass(frozen=True)
class L2Params:
    """A: (L*k, dims) Gaussian projections; B: (L*k,) uniform offsets in [0, w)
    (L2LshModel.java:50-64)."""

    dims: int
    L: int
    k: int
    w: int
    A: np.ndarray  # float32 (L*k, dims)
    B: np.ndarray  # float32 (L*k,)


@_model_cache
def derive_l2(cfg: L2LshConfig) -> L2Params:
    rng = JavaRandom(cfg.seed)
    a = (
        rng.next_gaussians(cfg.L * cfg.k * cfg.dims)
        .astype(np.float32)
        .reshape(cfg.L * cfg.k, cfg.dims)
    )
    b = np.empty((cfg.L * cfg.k,), dtype=np.float32)
    for i in range(cfg.L * cfg.k):
        b[i] = np.float32(rng.next_float()) * cfg.w
    return L2Params(cfg.dims, cfg.L, cfg.k, cfg.w, a, b)

"""Frozen configuration dataclasses — the engine's equivalent of the
reference's ``Mapping`` schema objects (elastiknn-api4s/.../Mapping.scala:8-20).

A config fully determines the model: parameters are derived from
``(config, seed)`` inside worker/actor ``__init__`` and never shipped or
stored, mirroring the reference's ModelCache design
(elastiknn-plugin/.../ModelCache.scala:10-27, docs/pages/internals.md:15-24).
All configs are hashable + picklable so they travel to Ray workers cheaply.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: The prime modulus of the MinHash universal hash family
#: (elastiknn-models/.../HashingModel.java:5).
HASH_PRIME = 2038074743

#: Band hash emitted for empty vectors: the reference hashes an empty sparse
#: vector to the same term for every band, with no band prefix, so all empty
#: vectors collide with each other and only each other
#: (JaccardLshModel.java:37-38 → writeInt(HASH_PRIME) repeated L times).
#: We reserve a single uint64 sentinel with the same collision semantics.
EMPTY_BAND_SENTINEL = (1 << 64) - 1


@dataclass(frozen=True)
class ShingleConfig:
    """k-shingling of text into hashed shingle IDs (SURVEY.md §2.5 N2).

    ``k`` consecutive tokens (whitespace-split, optionally lowercased) are
    combined into one 64-bit shingle hash; the per-doc shingle set is sorted
    and deduplicated — the reference's sorted-sparse-indices invariant
    (elastiknn-plugin/.../VectorMapper.scala:31).
    """

    k: int = 5
    lowercase: bool = True
    mode: str = "word"  # "word" | "char"


def _require(cond: bool, msg: str) -> None:
    """Plan-time dispatch validation (SURVEY.md §2.3 Q7): the engine's
    analogue of the reference's (query, mapping) compatibility checks
    (ElastiknnQueryBuilder.scala:38-92) — invalid configurations fail at
    CONSTRUCTION, not deep inside a worker task."""
    if not cond:
        raise ValueError(msg)


@dataclass(frozen=True)
class JaccardLshConfig:
    """MinHash-LSH (JaccardLshModel.java:27-63): L tables × k minhashes/table."""

    L: int = 16
    k: int = 4
    seed: int = 0

    def __post_init__(self):
        _require(self.L > 0 and self.k > 0, f"JaccardLshConfig: L and k must be positive (got L={self.L}, k={self.k})")


@dataclass(frozen=True)
class HammingLshConfig:
    """Bit-sampling LSH over a ``dims``-bit signature (HammingLshModel.java:31-61)."""

    dims: int = 64
    L: int = 16
    k: int = 4
    seed: int = 0

    def __post_init__(self):
        _require(self.dims > 0 and self.L > 0 and self.k > 0, f"HammingLshConfig: dims, L, k must be positive (got dims={self.dims}, L={self.L}, k={self.k})")
        _require(self.k <= self.dims, f"HammingLshConfig: k={self.k} bits per table cannot exceed dims={self.dims}")


@dataclass(frozen=True)
class CosineLshConfig:
    """Random-hyperplane LSH (CosineLshModel.java:26-51)."""

    dims: int = 0
    L: int = 16
    k: int = 8
    seed: int = 0

    def __post_init__(self):
        _require(self.dims > 0, f"CosineLshConfig: dims must be positive (got {self.dims}); pass the embedding dimensionality")
        _require(self.L > 0 and 0 < self.k <= 64, f"CosineLshConfig: need L > 0 and 0 < k <= 64 (got L={self.L}, k={self.k})")


@dataclass(frozen=True)
class L2LshConfig:
    """Stable-distribution LSH with optional multiprobe (L2LshModel.java:39-134)."""

    dims: int = 0
    L: int = 16
    k: int = 4
    w: int = 4
    seed: int = 0

    def __post_init__(self):
        _require(self.dims > 0, f"L2LshConfig: dims must be positive (got {self.dims})")
        _require(self.L > 0 and self.k > 0, f"L2LshConfig: L and k must be positive (got L={self.L}, k={self.k})")
        _require(self.w > 0, f"L2LshConfig: bucket width w must be positive (got {self.w}) — L2LshModel.java:45")


@dataclass(frozen=True)
class PermutationLshConfig:
    """Top-|value| index permutation hashing (PermutationLshModel.java:19-52)."""

    k: int = 16
    repeating: bool = True

    def __post_init__(self):
        _require(self.k > 0, f"PermutationLshConfig: k must be positive (got {self.k})")


@dataclass(frozen=True)
class DedupConfig:
    """End-to-end near-dup pipeline operating point (SURVEY.md §3.2).

    ``tau`` is the exact-Jaccard acceptance threshold applied to verified
    candidate pairs — decisions always use exact similarity, never the
    approximate band-collision count, matching the reference's exact
    re-scoring semantics (elastiknn-plugin/.../HashingQuery.scala:23-38).

    ``hot_band_cap`` bounds the O(g^2) pair blowup of a band group: groups
    larger than the cap emit star pairs around the min doc_id plus all-pairs
    within salt cells of <= cap docs (SURVEY.md §4 "hot keys / skew").
    """

    shingle: ShingleConfig = field(default_factory=ShingleConfig)
    lsh: JaccardLshConfig = field(default_factory=JaccardLshConfig)
    tau: float = 0.8
    hot_band_cap: int = 256


@dataclass(frozen=True)
class SimHashDedupConfig:
    """Operating point of the SimHash/Hamming near-dup path (SURVEY.md §7 M6).

    ``dims`` (multiple of 64) is the packed signature width; ``lsh`` the
    bit-sampling band layout (L tables × k sampled bits, HammingLshModel
    semantics); ``tau`` the exact packed-Hamming acceptance threshold (e.g.
    0.95 over 64 bits accepts pairs differing in <= 3 bits).

    Default L=8, k=16 over dims=64: a pair at Hamming distance 3 collides in
    a table with p = C(61,16)/C(64,16) ≈ 0.44 → candidate recall
    1-(1-p)^8 ≈ 0.99; with k=16 sampled bits per table, bucket counts are
    ~2^16 per table so candidate groups stay small.
    """

    shingle: ShingleConfig = field(default_factory=ShingleConfig)
    dims: int = 64
    lsh: HammingLshConfig = field(
        default_factory=lambda: HammingLshConfig(dims=64, L=8, k=16, seed=0)
    )
    tau: float = 0.95
    hot_band_cap: int = 256

"""Bit-exact regeneration of the reference's RecallSuite test corpora.

The reference pins LSH recall on three 5000x1024 corpora generated from ONE
shared ``new Random(0)`` stream (TestData.scala:85-92, Generate.main):

1. sparse-bool  — 5050 vectors, each bit true iff ``rng.nextDouble() <= 0.2``
   (Vec.SparseBool.random, Vec.scala:36-43); the generated file is committed
   at elastiknn-plugin-integration-tests/.../testdata-sparsebool.json.gz, so
   the regeneration is validated byte-for-byte against it.
2. dense-float  — 5050 vectors of ``(float) rng.nextGaussian()``
   (Vec.DenseFloat.random, Vec.scala:68-75), drawn AFTER all sparse draws.
3. dense-unit   — same again, then row-normalized (float32 norm).

Reproducing the exact stream (JavaRandom parity, elastiknn_ray/java_random.py)
gives the exact corpora the reference's published recall numbers were measured
on (RecallSuite.scala:59-144).  Generation costs ~20 s of pure-Python LCG
replay, so results are cached under /tmp.

Also provides the ES shard routing used by the suite (2 shards): murmur3_x86_32
over the UTF-16LE doc id, ``floorMod(hash, 1024) // 512`` (Elasticsearch
Murmur3HashFunction + the default number_of_routing_shards=1024 for a 2-shard
index) — docs "v0".."v4999" in insertion order within each shard, matching
Lucene segment docID order after the suite's serial bulk indexing.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import numpy as np

from elastiknn_ray.java_random import JavaRandom

DIMS = 1024
N_CORPUS = 5000
N_QUERIES = 50
N_NEIGHBORS = 100

_GZ = (
    "/root/reference/elastiknn-plugin-integration-tests/src/test/resources/"
    "com/klibisz/elastiknn/testdata-sparsebool.json.gz"
)
_CACHE = "/tmp/elastiknn_ray_ref_testdata_v1.npz"


# ------------------------------------------------------------ generation


def _gen_sparse(rng: JavaRandom, n: int) -> list[np.ndarray]:
    out = []
    nd = rng.next_double
    for _ in range(n):
        out.append(
            np.array([i for i in range(DIMS) if nd() <= 0.2], dtype=np.int64)
        )
    return out


def _gen_dense(rng: JavaRandom, n: int) -> np.ndarray:
    ng = rng.next_gaussian
    flat = [ng() for _ in range(n * DIMS)]
    return np.array(flat, dtype=np.float32).reshape(n, DIMS)


def _ragged(arrs: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([len(a) for a in arrs], out=offsets[1:])
    values = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
    return offsets, values


def generate_all() -> dict[str, np.ndarray]:
    """Replay the full Generate.main stream: sparse, dense, dense-unit."""
    if os.path.exists(_CACHE):
        with np.load(_CACHE) as z:
            return dict(z)
    rng = JavaRandom(0)
    sparse = _gen_sparse(rng, N_CORPUS + N_QUERIES)
    dense = _gen_dense(rng, N_CORPUS + N_QUERIES)
    unit_raw = _gen_dense(rng, N_CORPUS + N_QUERIES)
    # Vec.scala:71-73 — float32 norm accumulated over float32 squares.
    norms = np.sqrt(
        (unit_raw.astype(np.float32) ** 2).sum(axis=1, dtype=np.float32)
    ).astype(np.float32)
    unit = unit_raw / norms[:, None]
    sp_off, sp_val = _ragged(sparse)
    out = {
        "sparse_offsets": sp_off,
        "sparse_values": sp_val,
        "dense": dense,
        "unit": unit,
    }
    tmp = _CACHE.replace(".npz", f".tmp.{os.getpid()}.npz")
    np.savez_compressed(tmp, **out)
    os.replace(tmp, _CACHE)
    return out


def committed_sparse() -> dict | None:
    """Parse the committed testdata-sparsebool.json.gz (corpus true-index
    lists + per-query expected top-100 Jaccard/Hamming scores), or None if
    the reference checkout is unavailable."""
    if not os.path.exists(_GZ):
        return None
    d = json.loads(gzip.open(_GZ).read())
    corpus = [np.array(v["true_indices"], dtype=np.int64) for v in d["corpus"]]
    queries = [
        np.array(q["vector"]["true_indices"], dtype=np.int64)
        for q in d["queries"]
    ]
    expected: dict[str, np.ndarray] = {}
    for sim in ("jaccard", "hamming"):
        rows = []
        for q in d["queries"]:
            r = next(r for r in q["results"] if r["similarity"] == sim)
            rows.append(r["values"])
        expected[sim] = np.array(rows, dtype=np.float64)
    return {"corpus": corpus, "queries": queries, "expected": expected}


# ------------------------------------------------------------ ES routing


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Austin Appleby's murmur3_x86_32 (public domain), as used by
    Lucene StringHelper / Elasticsearch Murmur3HashFunction."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n4 = len(data) // 4 * 4
    for i in range(0, n4, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n4:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def es_shards(n: int = N_CORPUS, num_shards: int = 2) -> np.ndarray:
    """Shard of doc "v{i}" for i in range(n) under ES default routing
    (Murmur3HashFunction over UTF-16LE id bytes; routing_num_shards=1024)."""
    routing_num = 1024
    factor = routing_num // num_shards
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        h = murmur3_x86_32(f"v{i}".encode("utf-16-le"))
        h_signed = h - (1 << 32) if h >= (1 << 31) else h
        out[i] = (h_signed % routing_num) // factor  # floorMod semantics
    return out

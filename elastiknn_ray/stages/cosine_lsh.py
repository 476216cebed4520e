"""Cosine (random-hyperplane) LSH stages over an embedding column —
the engine's CosineLshModel (elastiknn-models/.../CosineLshModel.java:26-51)
as batched matmul kernels, plus the exact-cosine verify join and a
brute-force broadcast path for the embedding-near-dup training-data op.

    embeddings(vec_id, embedding list<float>)
      → CosineLshBandStage: (vec_id→doc_id, band_hash) exploded  [actor pool]
      → candidate_pairs (shared stage, stages/pairs.py)
      → verify_cosine_pairs: join embeddings both sides + exact cosine

Band identity: per table, k sign bits of plane·v (CosineLshModel.java:39-49)
FNV-mixed with the table index into a uint64 — same injective-encoding
argument as minhash.band_hashes.  Planes are (L*k, dims) Gaussians drawn via
JavaRandom from (config, seed) in each actor's __init__ (ModelCache
semantics, ModelCache.scala:10-27).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import CosineLshConfig
from elastiknn_ray.models.exact import cosine_similarity_pairs
from elastiknn_ray.models.params import derive_hyperplanes
from elastiknn_ray.stages.knn import _to_matrix, drop_null_vectors
from elastiknn_ray.stages.simhash import _checked_lookup

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hyperplane_band_hashes(m: np.ndarray, planes: np.ndarray, L: int, k: int) -> np.ndarray:
    """(N, dims) float matrix → (N, L) uint64 band hashes.

    One (N×dims)·(dims×L·k) matmul; bit = (plane·v > 0), exactly the
    reference's sign rule (CosineLshModel.java:44).
    """
    dots = m @ planes.T  # (N, L*k)
    bits = (dots > 0).astype(np.uint64).reshape(len(m), L, k)
    h = np.full((len(m), L), _FNV_OFFSET, dtype=np.uint64)
    table_ix = np.arange(L, dtype=np.uint64)[None, :]
    h = (h ^ table_ix) * _FNV_PRIME
    for j in range(k):
        h = (h ^ bits[:, :, j]) * _FNV_PRIME
    return h


class CosineLshBandStage:
    """(vec_id, embedding) → exploded (doc_id, band_hash) rows (actor pool;
    planes re-derived from (config, seed) once per actor)."""

    def __init__(self, lsh: CosineLshConfig):
        params = derive_hyperplanes(lsh)
        self.planes = params.planes.astype(np.float64)
        self.L = lsh.L
        self.k = lsh.k

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        m = _to_matrix(batch.column("embedding"))
        bh = hyperplane_band_hashes(m, self.planes, self.L, self.k)
        ids = batch.column("vec_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.L), pa.int64()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            }
        )


#: worker-process model cache (see hashing._MODEL_CACHE)
_MODEL_CACHE: dict = {}


def cosine_bands_fn(batch: pa.Table, lsh: CosineLshConfig) -> pa.Table:
    """Task-pool variant of CosineLshBandStage (planes cached per worker)."""
    stage = _MODEL_CACHE.get(lsh)
    if stage is None:
        stage = CosineLshBandStage(lsh)
        _MODEL_CACHE[lsh] = stage
    return stage(batch)


def encode_f32(m: np.ndarray) -> pa.Array:
    """(N, dims) float matrix → binary column of 4*dims-byte LE blobs.
    Dataset.join (acero) rejects list<float> payload columns; packed blobs
    join fine and decode zero-copy."""
    m32 = np.ascontiguousarray(m, dtype=np.float32)
    n, d = m32.shape
    flat = m32.view(np.uint8).reshape(n * d * 4)
    offsets = np.arange(0, (n + 1) * d * 4, d * 4, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
    )


def decode_f32(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Packed float32 binary column → (N, dims) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type):
        col = col.cast(pa.large_binary())
    n = len(col)
    if n == 0:
        return np.empty((0, 0))
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset : col.offset + n + 1]
    d = int(offs[1] - offs[0]) // 4
    data = np.frombuffer(col.buffers()[2], dtype=np.float32)
    return data[offs[0] // 4 : offs[-1] // 4].reshape(n, d).astype(np.float64)


def _cosine_pair_batch(batch: pa.Table) -> pa.Table:
    va = decode_f32(batch.column("emb_a"))
    vb = decode_f32(batch.column("emb_b"))
    score = cosine_similarity_pairs(va, vb)  # 1 + cos convention
    return pa.table(
        {
            "vec_a": batch.column("doc_a"),
            "vec_b": batch.column("doc_b"),
            "n_bands": batch.column("n_bands"),
            "score": pa.array(score, pa.float64()),
        }
    )


#: Candidate-doc gate for the shuffle-free broadcast verify (embeddings are
#: dims*4 bytes/doc; 2M docs at 256 dims ≈ 2 GB of object-store shards).
BROADCAST_EMB_LIMIT = 2_000_000


class _BroadcastCosineVerify:
    """Actor-pool verifier over candidate docs' embedding blocks: shard refs
    read zero-copy per actor; per pair batch two searchsorted lookups + one
    einsum — no shuffle."""

    def __init__(self, shard_refs, tau_cos: float):
        import ray

        tables = ray.get(list(shard_refs))
        ids_parts, mats = [], []
        for t in tables:
            t = drop_null_vectors(t)
            if t.num_rows == 0:
                continue
            ids_parts.append(t.column("vec_id").to_numpy(zero_copy_only=False))
            mats.append(_to_matrix(t.column("embedding")))
        if ids_parts:
            ids = np.concatenate(ids_parts)
            m = np.vstack(mats)
            order = np.argsort(ids, kind="stable")
            self.ids = ids[order]
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            self.mn = (m / norms)[order]
        else:
            self.ids = np.empty(0, np.int64)
            self.mn = np.empty((0, 0))
        self.thresh = 1.0 + float(tau_cos)

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        va = self.mn[_checked_lookup(self.ids, da)]
        vb = self.mn[_checked_lookup(self.ids, db)]
        score = 1.0 + np.einsum("ij,ij->i", va, vb)
        keep = score >= self.thresh
        return pa.table(
            {
                "vec_a": pa.array(da[keep], pa.int64()),
                "vec_b": pa.array(db[keep], pa.int64()),
                "n_bands": batch.column("n_bands").filter(pa.array(keep)),
                "score": pa.array(score[keep], pa.float64()),
            }
        )


def verify_cosine_pairs(pairs, embeddings, tau_cos: float, *, num_partitions: int = 8):
    """pairs × embeddings both sides → exact cosine → filter(cos >= tau_cos).

    ``tau_cos`` is a plain cosine; the emitted ``score`` column uses the
    reference's 1+cos convention (docs/pages/api.md:444-450).  Physical plan
    by candidate-doc count: under BROADCAST_EMB_LIMIT the candidate docs'
    embedding blocks travel to verify actors as object refs (shuffle-free);
    above it, two hash joins on packed-binary embeddings.
    """
    import ray
    import ray.data as rd

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "n_bands": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )

    if pairs.count() <= 2 * BROADCAST_EMB_LIMIT:
        uniq = pairs.map_batches(
            lambda t: pa.table(
                {
                    "vec_id": pa.array(
                        np.unique(
                            np.concatenate(
                                [
                                    t.column("doc_a").to_numpy(zero_copy_only=False),
                                    t.column("doc_b").to_numpy(zero_copy_only=False),
                                ]
                            )
                        ),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        id_parts = [
            b.column("vec_id").to_numpy(zero_copy_only=False)
            for b in uniq.iter_batches(batch_format="pyarrow")
        ]
        cand_ids = (
            np.unique(np.concatenate(id_parts)) if id_parts else np.empty(0, np.int64)
        )
        if len(cand_ids) <= BROADCAST_EMB_LIMIT:
            ids_ref = ray.put(cand_ids)

            def filt(t: pa.Table, _r=ids_ref) -> pa.Table:
                ids = ray.get(_r)
                d = t.column("vec_id").to_numpy(zero_copy_only=False)
                if len(ids) == 0:
                    return t.filter(pa.array(np.zeros(len(d), dtype=bool)))
                p = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
                return t.filter(pa.array(ids[p] == d))

            hits = (
                embeddings.select_columns(["vec_id", "embedding"])
                .map_batches(filt, batch_format="pyarrow")
                .materialize()
            )
            return pairs.map_batches(
                _BroadcastCosineVerify,
                fn_constructor_kwargs={
                    "shard_refs": hits.to_arrow_refs(),
                    "tau_cos": tau_cos,
                },
                batch_format="pyarrow",
                batch_size=8192,
                concurrency=(1, 32),
            )

    emb = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        lambda t: (lambda v: pa.table(
            {"vec_id": v.column("vec_id"), "emb": encode_f32(_to_matrix(v.column("embedding")))}
        ))(drop_null_vectors(t)),
        batch_format="pyarrow",
    )
    a = pairs.join(
        emb, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("vec_id",),
    )
    a = a.rename_columns({"emb": "emb_a"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "emb_a"]
    )
    b = a.join(
        emb, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("vec_id",),
    )
    b = b.rename_columns({"emb": "emb_b"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "emb_a", "emb_b"]
    )
    scored = b.map_batches(_cosine_pair_batch, batch_format="pyarrow")
    thresh = 1.0 + float(tau_cos)
    return scored.map_batches(
        lambda t, th=thresh: t.filter(
            pa.compute.greater_equal(t.column("score"), pa.scalar(th))
        ),
        batch_format="pyarrow",
    )


class BroadcastCosinePairs:
    """Brute-force embedding-near-dup: each batch scored against the full
    broadcast matrix (ray.put once, read per actor — never re-shipped per
    batch).  The exact-oracle path for small/medium corpora; the LSH path
    above is the scale path."""

    def __init__(self, corpus_ref, tau_cos: float):
        import ray

        c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
        self.ids = np.asarray(c["ids"], dtype=np.int64)
        m = np.asarray(c["matrix"], dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.mn = m / norms
        self.tau = float(tau_cos)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        ids = batch.column("vec_id").to_numpy()
        m = _to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (m / norms) @ self.mn.T  # (batch, corpus)
        bi, ci = np.nonzero(cos >= self.tau)
        a = ids[bi]
        b = self.ids[ci]
        keep = a < b  # canonical order, drops self pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
            }
        )


def cosine_dup_pairs_exact(embeddings, tau_cos: float, *, concurrency=(1, 8)):
    """All (vec_a < vec_b) pairs with cosine >= tau_cos, via broadcast
    brute force.  O(n^2) scores but only threshold-passing pairs move.

    The corpus matrix is broadcast ONCE (ray.put) and the accumulation
    streams ``iter_batches`` — the driver holds exactly one bounded copy.
    Gated at BROADCAST_EMB_LIMIT: above it this O(n^2) oracle path is the
    wrong tool (use the LSH path), so it errors instead of OOMing."""
    import ray

    embeddings = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    n = embeddings.count()
    if n > BROADCAST_EMB_LIMIT:
        raise ValueError(
            f"cosine_dup_pairs_exact is the brute-force oracle path; corpus "
            f"has {n} vectors > BROADCAST_EMB_LIMIT={BROADCAST_EMB_LIMIT}. "
            "Use the LSH candidate path (cosine_bands_fn + candidate_pairs + "
            "verify_cosine_pairs) at this scale."
        )
    ids_parts, mat_parts = [], []
    for b in embeddings.iter_batches(batch_format="pyarrow"):
        b = drop_null_vectors(b)
        ids_parts.append(b.column("vec_id").to_numpy(zero_copy_only=False))
        mat_parts.append(_to_matrix(b.column("embedding")))
    corpus = {
        "ids": np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64),
        "matrix": np.vstack(mat_parts) if mat_parts else np.empty((0, 0)),
    }
    ref = ray.put(corpus)
    return embeddings.map_batches(
        BroadcastCosinePairs,
        fn_constructor_kwargs={"corpus_ref": ref, "tau_cos": tau_cos},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )

"""Ray Data stages for the SimHash/Hamming near-dup path (SURVEY.md §7 M6).

    signatures(doc_id, shingles)
      → SimHashStage:        (doc_id, simhash large_binary[8*W])   [tasks]
      → bitsample_bands_fn:  (doc_id, band_hash) exploded  [task pool + cache]
      → candidate_pairs (shared with the Jaccard path)
      → verify_hamming_pairs: broadcast signatures + packed popcount
        (hash joins above the size gate)

Signatures are W = dims/64 little-endian uint64 lanes stored as a
fixed-width binary column (Dataset.join rejects large_list payloads, and
fixed-width blobs decode zero-copy to an (N, W) lane matrix).
"""

from __future__ import annotations

import numpy as np

def _checked_lookup(ids: np.ndarray, wanted: np.ndarray) -> np.ndarray:
    """Sorted-array membership lookup that REFUSES silent mis-gathers: every
    wanted id must be present (ADVICE fix — an absent id would otherwise
    gather another doc's payload or raise IndexError at the array end)."""
    ix = np.minimum(np.searchsorted(ids, wanted), max(len(ids) - 1, 0))
    if len(ids) == 0 or not (ids[ix] == wanted).all():
        missing = wanted if len(ids) == 0 else wanted[ids[ix] != wanted]
        raise KeyError(
            f"{len(missing)} pair doc_ids have no stored payload "
            f"(e.g. {missing[:3].tolist()})"
        )
    return ix


import pyarrow as pa

from elastiknn_ray.config import HammingLshConfig
from elastiknn_ray.models.exact import hamming_similarity_packed
from elastiknn_ray.models.params import derive_bitsample
from elastiknn_ray.models.simhash import bitsample_band_hashes, simhash_signatures
from elastiknn_ray.stages.hashing import decode_u64_lists


def encode_sigs(sig: np.ndarray) -> pa.Array:
    """uint64 (N, W) lane matrix → binary column of 8*W-byte LE blobs."""
    n, w = sig.shape
    flat = np.ascontiguousarray(sig).view(np.uint8).reshape(n * w * 8)
    offsets = np.arange(0, (n + 1) * w * 8, w * 8, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
    )


def decode_sigs(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Binary signature column → uint64 (N, W) lane matrix (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type):
        col = col.cast(pa.large_binary())
    n = len(col)
    if n == 0:
        return np.empty((0, 1), dtype=np.uint64)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64)[col.offset : col.offset + n + 1]
    width = int(offs[1] - offs[0]) // 8
    data = np.frombuffer(col.buffers()[2], dtype=np.uint64)
    return data[offs[0] // 8 : offs[-1] // 8].reshape(n, width)


class SimHashStage:
    """(doc_id, shingles) → (doc_id, simhash).  Stateless tasks."""

    def __init__(self, dims: int):
        self.dims = dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, values = decode_u64_lists(batch.column("shingles"))
        sig = simhash_signatures(offsets, values, self.dims)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "simhash": encode_sigs(sig),
            }
        )


class BitSampleBandStage:
    """(doc_id, simhash) → exploded (doc_id, band_hash) rows.

    Actor pool: sampled bit positions are re-derived from (config, seed) once
    per actor (ModelCache.scala:10-27 semantics via params.derive_bitsample,
    which reproduces HammingLshModel.java:81-92's rejection sampling).
    """

    def __init__(self, lsh: HammingLshConfig):
        self.params = derive_bitsample(lsh)
        self.L = lsh.L

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = decode_sigs(batch.column("simhash"))
        bh = bitsample_band_hashes(sig, self.params)  # (N, L)
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.L), pa.int64()),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            }
        )


#: worker-process model cache (see hashing._MODEL_CACHE): task pools reuse
#: worker processes, giving per-node parameter reuse with unbounded scaling
_MODEL_CACHE: dict = {}


def bitsample_bands_fn(batch: pa.Table, lsh: HammingLshConfig) -> pa.Table:
    """Task-pool variant of BitSampleBandStage."""
    stage = _MODEL_CACHE.get(lsh)
    if stage is None:
        stage = BitSampleBandStage(lsh)
        _MODEL_CACHE[lsh] = stage
    return stage(batch)


def _hamming_batch(batch: pa.Table, dims: int) -> pa.Table:
    sa = decode_sigs(batch.column("simhash_a"))
    sb = decode_sigs(batch.column("simhash_b"))
    sim = hamming_similarity_packed(sa, sb, dims)
    return pa.table(
        {
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "n_bands": batch.column("n_bands"),
            "hamming": pa.array(sim, pa.float64()),
        }
    )


#: Packed signatures are 8*W bytes/doc, so broadcasting the whole signature
#: table is cheap far beyond the Jaccard path's limit.
BROADCAST_SIG_LIMIT = 20_000_000


class _BroadcastHammingVerify:
    """Actor-pool verifier: signature lane matrix broadcast once via
    ray.put, looked up by sorted-id searchsorted per pair batch."""

    def __init__(self, sig_ref, dims: int, tau: float):
        import ray

        s = ray.get(sig_ref) if not isinstance(sig_ref, dict) else sig_ref
        self.ids = s["ids"]
        self.sig = s["sig"]
        self.dims = dims
        self.tau = float(tau)

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        sa = self.sig[_checked_lookup(self.ids, da)]
        sb = self.sig[_checked_lookup(self.ids, db)]
        sim = hamming_similarity_packed(sa, sb, self.dims)
        keep = sim >= self.tau
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "n_bands": batch.column("n_bands").filter(pa.array(keep)),
                "hamming": pa.array(sim[keep], pa.float64()),
            }
        )


def verify_hamming_pairs(
    pairs, signatures, dims: int, tau: float, *, num_partitions: int = 8
):
    """pairs(doc_a, doc_b, n_bands) × signatures(doc_id, simhash) → packed
    Hamming similarity → filter(hamming >= tau).

    Decisions use the EXACT signature similarity, never the band-collision
    count (the reference's re-scoring contract, HashingQuery.scala:23-38).
    Signatures are 8*W bytes/doc, so up to BROADCAST_SIG_LIMIT docs the whole
    table broadcasts once (shuffle-free verify); above it, two hash joins.
    """
    import ray
    import ray.data as rd

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_bands": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.float64()),
                }
            )
        )

    n_docs = signatures.count()
    if n_docs <= BROADCAST_SIG_LIMIT:
        ids_parts, sig_parts = [], []
        for b in signatures.select_columns(["doc_id", "simhash"]).iter_batches(
            batch_format="pyarrow"
        ):
            ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            sig_parts.append(decode_sigs(b.column("simhash")))
        ids = np.concatenate(ids_parts)
        sig = np.vstack(sig_parts)
        order = np.argsort(ids, kind="stable")
        sig_ref = ray.put({"ids": ids[order], "sig": sig[order]})
        return pairs.map_batches(
            _BroadcastHammingVerify,
            fn_constructor_kwargs={"sig_ref": sig_ref, "dims": dims, "tau": tau},
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=(1, 32),
        )

    sig = signatures.select_columns(["doc_id", "simhash"])
    a = pairs.join(
        sig, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("doc_id",),
    )
    a = a.rename_columns({"simhash": "simhash_a"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "simhash_a"]
    )
    b = a.join(
        sig, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("doc_id",),
    )
    b = b.rename_columns({"simhash": "simhash_b"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "simhash_a", "simhash_b"]
    )
    scored = b.map_batches(
        lambda t, d=dims: _hamming_batch(t, d), batch_format="pyarrow"
    )
    return scored.map_batches(
        lambda t, tau=tau: t.filter(
            pa.compute.greater_equal(t.column("hamming"), pa.scalar(float(tau)))
        ),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------ kNN read path

def gather_query_sigs(signatures, query_ids: np.ndarray) -> dict:
    """Collect the Q query docs' packed signatures to the driver (a query
    wave, not the corpus): {"ids": (Q,), "sig": (Q, W) uint64}."""
    import ray

    qids = np.sort(np.asarray(query_ids, dtype=np.int64))
    ref = ray.put(qids)

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # empty query wave: keep schema, drop all rows
            return t.slice(0, 0)
        pos = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[pos] == d))

    ids_parts, sig_parts = [], []
    for b in (
        signatures.select_columns(["doc_id", "simhash"])
        .map_batches(filt, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        if b.num_rows == 0:
            continue
        ids_parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
        sig_parts.append(decode_sigs(b.column("simhash")))
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    sig = np.vstack(sig_parts) if sig_parts else np.empty((0, 1), np.uint64)
    order = np.argsort(ids, kind="stable")
    return {"ids": ids[order], "sig": sig[order]}


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Per-row popcount of a uint64 (N, W) lane matrix."""
    return (
        np.unpackbits(x.view(np.uint8).reshape(x.shape[0], -1), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


def knn_exact_hamming_sig(signatures, query_sigs: dict, k: int, dims: int):
    """Brute-force Hamming kNN over packed signatures (H7's packed fast
    path as a query): per batch XOR + popcount per query, partial top-k,
    global merge.  Score = (dims - hammingDist) / dims (ExactModel.java:19-23)."""
    from elastiknn_ray.stages.knn import topk_per_query

    qids = query_sigs["ids"]
    qsig = query_sigs["sig"]

    def score_batch(batch: pa.Table) -> pa.Table:
        sig = decode_sigs(batch.column("simhash"))
        ids = batch.column("doc_id").to_numpy()
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, len(ids))
        for qi in range(len(qids)):
            dist = _popcount_rows(sig ^ qsig[qi][None, :])
            score = (dims - dist) / float(dims)
            # Deterministic partial cut: scores take only dims+1 discrete
            # values so ties at the boundary are common — order by
            # (score desc, neighbor_id asc) exactly like the global top-k
            # merge, so partitioning never changes which tied doc survives.
            top = np.lexsort((ids, -score))[:kk]
            out_q.append(np.full(len(top), qids[qi], dtype=np.int64))
            out_n.append(ids[top])
            out_s.append(score[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = signatures.map_batches(
        score_batch, batch_format="pyarrow", batch_size=8192
    )
    return topk_per_query(partials, k)


def knn_hamming_lsh(
    signatures,
    query_sigs: dict,
    k: int,
    *,
    lsh: HammingLshConfig,
    candidates: int = 100,
    num_partitions: int = 16,
    corpus_bands=None,
):
    """Approximate Hamming kNN — the HammingLshModel read path: bit-sampled
    band collisions (HammingLshModel.java:95-127) → per-query candidate cut
    → exact packed-Hamming re-score → top-k.  Counting + cut use the shared
    ONE-shuffle path (count_cut_partials → merge_cut_candidates).  Pass a
    materialized band table (optionally :func:`~elastiknn_ray.stages.knn.
    sort_band_blocks` postings) as ``corpus_bands`` to amortize corpus
    hashing across query waves."""
    from elastiknn_ray.stages.knn import (
        QueryHashIndex,
        count_cut_partials_auto,
        merge_cut_candidates,
        topk_per_query,
    )

    params = derive_bitsample(lsh)
    qh = bitsample_band_hashes(query_sigs["sig"], params)  # (Q, L)
    qindex = QueryHashIndex(query_sigs["ids"], qh)

    bands = corpus_bands
    if bands is None:
        bands = signatures.map_batches(
            bitsample_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow"
        )
    cand = merge_cut_candidates(
        count_cut_partials_auto(bands, qindex, candidates), candidates,
        n_parts=num_partitions,
    )

    # exact re-score: broadcast the candidate docs' packed signatures once
    # (8*W bytes per doc; the same shard-ref gather as the verify stage
    # would lift this above BROADCAST_DOC_LIMIT corpora)
    import ray

    q_ref = ray.put(query_sigs)
    cand = cand.materialize()
    cand_ids = np.unique(
        np.concatenate(
            [
                b.column("neighbor_id").to_numpy(zero_copy_only=False)
                for b in cand.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    ids_ref = ray.put(cand_ids)

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t.filter(pa.array(np.zeros(len(d), dtype=bool)))
        p = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[p] == d))

    hits_ds = (
        signatures.select_columns(["doc_id", "simhash"])
        .map_batches(filt, batch_format="pyarrow")
        .materialize()
    )

    class _Rescore:
        def __init__(self, shard_refs, q_ref, dims):
            tables = ray.get(list(shard_refs))
            ids_parts, sig_parts = [], []
            for t in tables:
                if t.num_rows == 0:
                    continue
                ids_parts.append(t.column("doc_id").to_numpy(zero_copy_only=False))
                sig_parts.append(decode_sigs(t.column("simhash")))
            if ids_parts:
                ids = np.concatenate(ids_parts)
                sig = np.vstack(sig_parts)
                order = np.argsort(ids, kind="stable")
                self.ids, self.sig = ids[order], sig[order]
            else:
                self.ids = np.empty(0, np.int64)
                self.sig = np.empty((0, 1), np.uint64)
            qd = ray.get(q_ref)
            self.qids, self.qsig = qd["ids"], qd["sig"]
            self.dims = dims

        def __call__(self, t: pa.Table) -> pa.Table:
            qi = t.column("query_id").to_numpy(zero_copy_only=False)
            ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
            sa = self.qsig[np.searchsorted(self.qids, qi)]
            sb = self.sig[_checked_lookup(self.ids, ni)]
            dist = _popcount_rows(sa ^ sb)
            score = (self.dims - dist) / float(self.dims)
            return pa.table(
                {
                    "query_id": pa.array(qi, pa.int64()),
                    "neighbor_id": pa.array(ni, pa.int64()),
                    "score": pa.array(score, pa.float64()),
                }
            )

    scored = cand.map_batches(
        _Rescore,
        fn_constructor_kwargs={
            "shard_refs": hits_ds.to_arrow_refs(),
            "q_ref": q_ref,
            "dims": lsh.dims,
        },
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )
    return topk_per_query(scored, k)

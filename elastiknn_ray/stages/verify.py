"""Exact verification of candidate pairs (SURVEY.md §2.3 Q3 + §2.1 H6).

Mirrors the reference's re-scoring contract: the final decision for every
candidate uses the EXACT similarity computed from the stored vectors, never
the approximate hash-collision count (HashingQuery.scala:23-38,
MatchHashesAndScoreQuery.java:100-130).  The Lucene doc-values point lookup
(StoredVecReader.scala:8-27) becomes, under the broadcast gate, a zero-copy
object-store gather of just the candidate docs' signatures (shuffle-free
verify), or a hash-partitioned ``Dataset.join`` on each side's doc id above
the gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.models.exact import jaccard_similarity
from elastiknn_ray.stages.hashing import decode_u64_lists


def _jaccard_batch(batch: pa.Table) -> pa.Table:
    ao, av = decode_u64_lists(batch.column("shingles_a"))
    bo, bv = decode_u64_lists(batch.column("shingles_b"))
    j = jaccard_similarity(ao, av, bo, bv)
    return pa.table(
        {
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "n_bands": batch.column("n_bands"),
            "jaccard": pa.array(j, pa.float64()),
        }
    )


#: Below this many distinct candidate doc_ids the verify stage gathers just
#: those docs' signatures into the object store once and verifies with a pure
#: map_batches lookup (no shuffle at all).  Above it, falls back to the
#: two-sided shuffle join.  ~1M docs × ~6KB signatures ≈ 6GB — the upper end
#: of a sane single-object broadcast on a 128GiB-heap worker fleet.
BROADCAST_DOC_LIMIT = 1_000_000


def _within(seg_lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] position-within-segment array."""
    total = int(seg_lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.zeros(len(seg_lens), dtype=np.int64)
    np.cumsum(seg_lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, seg_lens)


class _BroadcastJaccardVerify:
    """Actor-pool verifier over the candidate docs' signature blocks.

    The driver never touches signature BYTES: filtered signature blocks stay
    in the object store and their refs are handed to each actor, which reads
    them zero-copy in ``__init__`` and builds only the small sorted-id →
    (shard, row) index.  Per pair batch: searchsorted lookups + per-shard
    vectorized ragged gathers + the batched exact-Jaccard kernel.
    """

    def __init__(self, shard_refs, tau: float):
        import ray

        tables = ray.get(list(shard_refs))
        self.shard_offsets: list[np.ndarray] = []
        self.shard_values: list[np.ndarray] = []
        ids_parts, shard_parts, row_parts = [], [], []
        for si, t in enumerate(tables):
            if t.num_rows == 0:
                continue
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            off, vals = decode_u64_lists(t.column("shingles"))
            k = len(self.shard_offsets)
            self.shard_offsets.append(off)
            self.shard_values.append(vals)
            ids_parts.append(ids)
            shard_parts.append(np.full(len(ids), k, dtype=np.int64))
            row_parts.append(np.arange(len(ids), dtype=np.int64))
        if ids_parts:
            all_ids = np.concatenate(ids_parts)
            order = np.argsort(all_ids, kind="stable")
            self.ids = all_ids[order]
            self.shard_of = np.concatenate(shard_parts)[order]
            self.row_of = np.concatenate(row_parts)[order]
        else:
            self.ids = np.empty(0, np.int64)
            self.shard_of = np.empty(0, np.int64)
            self.row_of = np.empty(0, np.int64)
        self.tau = float(tau)

    def _gather(self, doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ix = np.minimum(np.searchsorted(self.ids, doc_ids), len(self.ids) - 1)
        if len(self.ids) == 0 or not (self.ids[ix] == doc_ids).all():
            missing = doc_ids if len(self.ids) == 0 else doc_ids[self.ids[ix] != doc_ids]
            raise KeyError(
                f"verify: {len(missing)} candidate doc_ids have no signature "
                f"(e.g. {missing[:3].tolist()}); pairs and signatures disagree"
            )
        s = self.shard_of[ix]
        r = self.row_of[ix]
        n = len(doc_ids)
        lens = np.empty(n, dtype=np.int64)
        for si in np.unique(s):
            m = s == si
            off = self.shard_offsets[si]
            lens[m] = off[r[m] + 1] - off[r[m]]
        out_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        out_vals = np.empty(out_off[-1], dtype=np.uint64)
        for si in np.unique(s):
            m = s == si
            off = self.shard_offsets[si]
            starts = off[r[m]]
            seg_lens = lens[m]
            # flat source index per output element of this shard's rows
            flat_src = np.repeat(starts, seg_lens) + _within(seg_lens)
            flat_dst = np.repeat(out_off[:-1][m], seg_lens) + _within(seg_lens)
            out_vals[flat_dst] = self.shard_values[si][flat_src]
        return out_off, out_vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        ao, av = self._gather(da)
        bo, bv = self._gather(db)
        j = jaccard_similarity(ao, av, bo, bv)
        keep = j >= self.tau
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "n_bands": batch.column("n_bands").filter(pa.array(keep)),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )


def _gather_candidate_signatures(pairs, signatures):
    """Collect the signatures of docs appearing in ``pairs`` into flat numpy
    arrays (sorted ids + ragged values) for the broadcast verifier.
    Returns None when the candidate doc set exceeds BROADCAST_DOC_LIMIT.

    Driver-side work is bounded: per-batch uniques are pre-reduced in
    distributed map_batches; the driver only unions the (deduped, 8-byte)
    id arrays and concatenates the filtered signature batches, both of which
    are <= the broadcast object we are about to create anyway.
    """
    import ray

    if pairs.count() > 2 * BROADCAST_DOC_LIMIT:
        return None

    uniq = pairs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.array(
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
        b.column("doc_id").to_numpy(zero_copy_only=False)
        for b in uniq.iter_batches(batch_format="pyarrow")
    ]
    cand_ids = (
        np.unique(np.concatenate(id_parts)) if id_parts else np.empty(0, np.int64)
    )
    if len(cand_ids) > BROADCAST_DOC_LIMIT:
        return None
    ids_ref = ray.put(cand_ids)

    def filt(t: pa.Table, _ids_ref=ids_ref) -> pa.Table:
        ids = ray.get(_ids_ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t.filter(pa.array(np.zeros(len(d), dtype=bool)))
        pos = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[pos] == d))

    # the filtered blocks STAY in the object store; only their refs travel.
    # (serial driver work here is O(candidate-id bytes), not O(signature
    # bytes) — the signature payload never crosses the driver heap.)
    hits = (
        signatures.select_columns(["doc_id", "shingles"])
        .map_batches(filt, batch_format="pyarrow")
        .materialize()
    )
    # the ObjectRefs themselves keep the blocks alive for the actors
    return {"shard_refs": hits.to_arrow_refs()}


def verify_pairs(
    pairs,
    signatures,
    tau: float,
    *,
    num_partitions: int = 32,
    concurrency=(1, 32),
):
    """pairs(doc_a, doc_b, n_bands) × signatures(doc_id, shingles) → exact
    Jaccard → filter(jaccard >= tau).  Returns (doc_a, doc_b, n_bands,
    jaccard).

    Two physical plans, chosen by candidate-doc count:

    - **broadcast gather** (candidate docs <= BROADCAST_DOC_LIMIT): ship ONE
      object-store copy of just the candidate docs' signatures; verification
      is a shuffle-free map_batches over the pair stream.  The common case —
      the candidate set is orders of magnitude smaller than the corpus.
    - **shuffle join** fallback: two hash joins keyed on doc id (uniform url
      hashes — no join-side skew; pair-side skew was capped at candidate
      generation).
    """
    import ray
    import ray.data as rd

    # A zero-row pair set loses its schema through the shuffle and breaks the
    # acero join ("no match for key field"); the candidate set is orders of
    # magnitude smaller than the corpus (deduped + hot-band-capped), so
    # pinning it here is cheap and also lets resumable callers count it.
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_bands": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    gathered = _gather_candidate_signatures(pairs, signatures)
    if gathered is not None:
        return pairs.map_batches(
            _BroadcastJaccardVerify,
            fn_constructor_kwargs={
                "shard_refs": gathered["shard_refs"],
                "tau": tau,
            },
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=concurrency,
        )

    sig = signatures.select_columns(["doc_id", "shingles"])
    a = pairs.join(
        sig,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("doc_id",),
    )
    a = a.rename_columns({"shingles": "shingles_a"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "shingles_a"]
    )
    b = a.join(
        sig,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("doc_id",),
    )
    b = b.rename_columns({"shingles": "shingles_b"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "shingles_a", "shingles_b"]
    )
    scored = b.map_batches(_jaccard_batch, batch_format="pyarrow")
    return scored.map_batches(
        lambda t, tau=tau: t.filter(
            pa.compute.greater_equal(t.column("jaccard"), pa.scalar(float(tau)))
        ),
        batch_format="pyarrow",
    )

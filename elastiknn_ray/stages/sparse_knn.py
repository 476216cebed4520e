"""k-nearest-neighbor search over SPARSE BOOL vectors (k-shingle sets) —
the reference's most-used surface: kNN with Jaccard / Hamming similarity
over ``Vec.SparseBool`` (ElastiknnQueryBuilder.scala:38-92, exercised by
RecallSuite.scala:59-100).

Two read paths, both over the signature table (doc_id, shingles, n_shingles)
produced by ``stages/hashing.SignatureStage``:

- **exact** (ExactQuery.scala:18-50 semantics): broadcast the Q query sets
  once; one streaming pass over corpus signatures computes, fully
  vectorized, the intersection of every (query, corpus-doc) pair that shares
  >= 1 element (docs sharing nothing are not candidates — mirroring the
  inverted-index retrieval model where a doc with no matching term is never
  scored), keeps a per-batch partial top-k per query, then a final per-query
  merge.
- **LSH** (the full read path, SURVEY.md §3.2): MinHash band collisions
  counted against the corpus band table (countHits), per-query candidate cut
  (kthGreatest), exact Jaccard re-score of candidates only via the
  broadcast-gather verify stage, global top-k.

Scores follow ExactModel.java: jaccard = isec/union; Hamming ranking uses
the symmetric-difference size (total_indices cancels out of the ranking, so
the integer 2*isec - |A| - |B| is an order-equivalent score).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from elastiknn_ray.config import JaccardLshConfig, ShingleConfig
from elastiknn_ray.stages.hashing import decode_u64_lists
from elastiknn_ray.stages.knn import QueryHashIndex, topk_per_query


def gather_query_sets(signatures, query_ids: np.ndarray) -> dict:
    """Collect the Q query docs' shingle sets to the driver (Q is small —
    a query wave, not the corpus): {"ids", "offsets", "values", "sizes"}
    ordered by ascending query id."""
    qids = np.sort(np.asarray(query_ids, dtype=np.int64))
    ref = ray.put(qids)

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # empty query wave: keep schema, drop all rows
            return t.slice(0, 0)
        pos = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[pos] == d))

    rows: dict[int, np.ndarray] = {}
    for b in (
        signatures.select_columns(["doc_id", "shingles"])
        .map_batches(filt, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        off, vals = decode_u64_lists(b.column("shingles"))
        for i, d in enumerate(b.column("doc_id").to_pylist()):
            rows[int(d)] = vals[off[i] : off[i + 1]]
    present = [d for d in qids.tolist() if d in rows]
    sets = [rows[d] for d in present]
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    offsets = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    values = (
        np.concatenate(sets) if sets else np.empty(0, np.uint64)
    )
    return {
        "ids": np.array(present, dtype=np.int64),
        "offsets": offsets,
        "values": values,
        "sizes": sizes,
    }


class SparseSetTopK:
    """Actor-pool scorer: holds the broadcast query-set index; per corpus
    signature batch emits a partial top-k per query — all vectorized (the
    per-(query, doc) intersection counts come from one postings expansion +
    one np.unique over packed keys; no Python row loops)."""

    def __init__(self, queries_ref, k: int, metric: str = "jaccard"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["ids"]
        self.qsizes = q["sizes"]
        self.index = QueryHashIndex.from_ragged(q["ids"], q["offsets"], q["values"])
        self.k = int(k)
        if metric not in ("jaccard", "hamming"):
            raise ValueError(metric)
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, values = decode_u64_lists(batch.column("shingles"))
        doc_ids = batch.column("doc_id").to_numpy()
        sizes = np.diff(offsets)
        n = len(doc_ids)
        doc_of_val = np.repeat(np.arange(n, dtype=np.int64), sizes)
        q_ix, rows = self.index.expand_indices(values)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if len(q_ix) == 0:
            return empty
        d_ix = doc_of_val[rows]
        # intersection count per (query, doc): shingle sets are unique within
        # a doc AND within a query, so each collision row is one shared element
        key = q_ix * n + d_ix
        ukey, isec = np.unique(key, return_counts=True)
        uq = ukey // n
        ud = ukey % n
        qs = self.qsizes[uq].astype(np.float64)
        ds = sizes[ud].astype(np.float64)
        if self.metric == "jaccard":
            denom = qs + ds - isec
            score = np.divide(
                isec, denom, out=np.ones(len(isec)), where=denom > 0
            )
        else:  # hamming: rank by symmetric difference, ascending
            score = 2.0 * isec - qs - ds
        neigh = doc_ids[ud]
        # partial per-query top-(k+1) within the batch (+1 covers self rows
        # removed at the final merge)
        order = np.lexsort((neigh, -score, uq))
        oq = uq[order]
        starts = np.flatnonzero(np.r_[True, oq[1:] != oq[:-1]])
        run_lens = np.diff(np.r_[starts, len(oq)])
        within = np.arange(len(oq), dtype=np.int64) - np.repeat(starts, run_lens)
        keep = order[within < self.k + 1]
        return pa.table(
            {
                "query_id": pa.array(self.qids[uq[keep]], pa.int64()),
                "neighbor_id": pa.array(neigh[keep], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
            }
        )


def knn_exact_sparse(
    signatures,
    query_sets: dict,
    k: int,
    *,
    metric: str = "jaccard",
    concurrency=(1, 8),
):
    """signatures(doc_id, shingles, n_shingles) → (query_id, rank,
    neighbor_id, score): exact top-k under set similarity, candidates
    restricted to docs sharing >= 1 element with the query."""
    ref = ray.put(query_sets)
    partials = signatures.map_batches(
        SparseSetTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "metric": metric},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    return topk_per_query(partials, k)


def _ragged_take(
    g_off: np.ndarray, g_val: np.ndarray, rix: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather rows ``rix`` out of a ragged (offsets, values) structure into a
    new compact ragged structure (offsets (len(rix)+1,), values)."""
    lens = g_off[rix + 1] - g_off[rix]
    out_off = np.zeros(len(rix) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return out_off, np.empty(0, g_val.dtype)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    return out_off, g_val[np.repeat(g_off[rix], lens) + within]


class SparseBandIndex:
    """Materialized MinHash band postings (hash-sorted blocks) + the corpus
    shingle sets gathered ONCE into an id-sorted ragged structure in the
    object store — the sparse analogue of :class:`~elastiknn_ray.stages.knn.
    BandIndex` (HashingQuery.index + StoredVecReader, build once / query
    many)."""

    def __init__(self, bands, lsh: JaccardLshConfig, sig_ref):
        self.bands = bands
        self.lsh = lsh
        self.sig_ref = sig_ref  # ObjectRef -> (ids_sorted, offsets, values)


@ray.remote(num_cpus=1)
def _gather_signatures_task(sig_refs):
    """One cluster-wide gather of (doc_id, shingles) blocks into an id-sorted
    ragged (ids, offsets, values) triple, mapped zero-copy by every re-score
    task."""
    tables = ray.get(list(sig_refs))
    ids_parts, len_parts, val_parts = [], [], []
    for t in tables:
        if t.num_rows == 0:
            continue
        ids_parts.append(t.column("doc_id").to_numpy(zero_copy_only=False))
        off, vals = decode_u64_lists(t.column("shingles"))
        len_parts.append(np.diff(off))
        val_parts.append(vals)
    if not ids_parts:
        return (
            np.empty(0, np.int64),
            np.zeros(1, np.int64),
            np.empty(0, np.uint64),
        )
    ids = np.concatenate(ids_parts)
    lens = np.concatenate(len_parts)
    vals = np.concatenate(val_parts)
    g_off = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=g_off[1:])
    order = np.argsort(ids, kind="stable")
    out_off, out_val = _ragged_take(g_off, vals, order)
    return ids[order], out_off, out_val


def build_jaccard_band_index(
    signatures, lsh: JaccardLshConfig, *, num_blocks: int | None = None
) -> SparseBandIndex:
    """signatures(doc_id, shingles, ...) → SparseBandIndex: hash-sorted band
    postings blocks + one shared gather of the stored shingle sets."""
    from elastiknn_ray.stages.hashing import minhash_bands_fn
    from elastiknn_ray.stages.knn import sort_band_blocks

    sigs = signatures.select_columns(["doc_id", "shingles"])
    if num_blocks:
        sigs = sigs.repartition(num_blocks)
    sigs = sigs.materialize()
    bands = sort_band_blocks(
        sigs.map_batches(
            minhash_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow",
            batch_size=4096,
        )
    ).materialize()
    return SparseBandIndex(
        bands=bands,
        lsh=lsh,
        sig_ref=_gather_signatures_task.remote(sigs.to_arrow_refs()),
    )


def _knn_jaccard_indexed(
    index: SparseBandIndex, query_sets: dict, qindex, k: int, candidates: int,
    n_parts: int,
):
    """Indexed Jaccard read path: seek-counted partials → ONE broadcast merge
    whose kernel cuts to ``candidates`` per query, exact-Jaccard re-scores
    against the shared gathered shingle sets and emits the top-k — no
    per-wave corpus rescan, no per-wave actor pool."""
    from elastiknn_ray.models.exact import jaccard_similarity
    from elastiknn_ray.stages.knn import (
        _within_runs,
        broadcast_or_shuffle_merge,
        count_cut_partials_sorted,
    )

    sig_ref = index.sig_ref
    q_ref = ray.put(
        {
            "ids": np.asarray(query_sets["ids"], dtype=np.int64),
            "offsets": np.asarray(query_sets["offsets"], dtype=np.int64),
            "values": np.asarray(query_sets["values"], dtype=np.uint64),
        }
    )

    def merge_rescore_topk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qi = t.column("query_id").to_numpy(zero_copy_only=False)
        ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        nb = t.column("n_bands").to_numpy(zero_copy_only=False)
        # merge partials (sum split pairs) + global per-query cut
        o = np.lexsort((ni, qi))
        qs, ns, nbs = qi[o], ni[o], nb[o]
        newg = np.r_[True, (qs[1:] != qs[:-1]) | (ns[1:] != ns[:-1])]
        total = np.add.reduceat(nbs, np.flatnonzero(newg))
        qi, ni = qs[newg], ns[newg]
        order = np.lexsort((ni, -total, qi))
        keep = order[_within_runs(qi[order]) < candidates]
        qi, ni = qi[keep], ni[keep]
        # exact Jaccard against the shared gathered sets (zero-copy)
        ids_s, s_off, s_val = ray.get(sig_ref)
        qd = ray.get(q_ref)
        q_sorted_ix = np.argsort(qd["ids"], kind="stable")
        qix = q_sorted_ix[np.searchsorted(qd["ids"][q_sorted_ix], qi)]
        vix = np.searchsorted(ids_s, ni)
        ao, av = _ragged_take(qd["offsets"], qd["values"], qix)
        bo, bv = _ragged_take(s_off, s_val, vix)
        score = jaccard_similarity(ao, av, bo, bv)
        m = ni != qi  # self-exclusion (parity with topk_per_query)
        qi, ni, score = qi[m], ni[m], score[m]
        order = np.lexsort((ni, -score, qi))
        within = _within_runs(qi[order])
        keep = order[within < k]
        return pa.table(
            {
                "query_id": pa.array(qi[keep], pa.int64()),
                "rank": pa.array(within[within < k] + 1, pa.int64()),
                "neighbor_id": pa.array(ni[keep], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
            }
        )

    partials = count_cut_partials_sorted(index.bands, qindex, candidates)
    return broadcast_or_shuffle_merge(partials, n_parts, merge_rescore_topk)


def knn_lsh_jaccard(
    signatures,
    query_sets: dict,
    k: int,
    *,
    lsh: JaccardLshConfig | None = None,
    candidates: int = 100,
    num_partitions: int = 16,
    corpus_bands=None,
):
    """Approximate Jaccard kNN — MinHash band collisions → per-query
    candidate cut → exact-Jaccard re-score (via the shared verify stage)
    → top-k.  Mirrors the reference's HashingQuery read path with
    JaccardLshModel hashing (JaccardLshModel.java:55-136).  Collision
    counting + candidate cut run on the shared ONE-shuffle path
    (count_cut_partials → merge_cut_candidates): per-block complete counts
    with a partial cut, then a single coarse per-query merge — no raw
    hit-row shuffle, no per-query pandas UDF."""
    from elastiknn_ray.models.minhash import _Workspace, band_hashes
    from elastiknn_ray.models.params import derive_minhash
    from elastiknn_ray.stages.hashing import minhash_bands_fn
    from elastiknn_ray.stages.knn import (
        count_cut_partials_auto,
        merge_cut_candidates,
    )

    if isinstance(corpus_bands, SparseBandIndex):
        lsh = corpus_bands.lsh  # the index owns the mapping (Q7 dispatch)
    else:
        lsh = lsh or JaccardLshConfig(L=32, k=3, seed=0)
    params = derive_minhash(lsh)
    qh = band_hashes(
        query_sets["offsets"], query_sets["values"], params, _Workspace()
    )  # (Q, L)
    qindex = QueryHashIndex(query_sets["ids"], qh)

    if isinstance(corpus_bands, SparseBandIndex):
        return _knn_jaccard_indexed(
            corpus_bands, query_sets, qindex, k, candidates, num_partitions
        )

    if corpus_bands is None:
        # fit-once/query-many: pass a materialized band table (the
        # index-once model, HashingQuery.index) to amortize corpus hashing
        # across query waves
        corpus_bands = signatures.map_batches(
            minhash_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow"
        )
    cand = merge_cut_candidates(
        count_cut_partials_auto(corpus_bands, qindex, candidates), candidates,
        n_parts=num_partitions,
    )
    pairs = cand.map_batches(
        lambda t: pa.table(
            {
                "doc_a": t.column("query_id").cast(pa.int64()),
                "doc_b": t.column("neighbor_id").cast(pa.int64()),
                "n_bands": t.column("n_bands").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    from elastiknn_ray.stages.verify import verify_pairs

    scored = verify_pairs(pairs, signatures, 0.0)
    scored = scored.map_batches(
        lambda t: pa.table(
            {
                "query_id": t.column("doc_a"),
                "neighbor_id": t.column("doc_b"),
                "score": t.column("jaccard"),
            }
        ),
        batch_format="pyarrow",
    )
    return topk_per_query(scored, k)

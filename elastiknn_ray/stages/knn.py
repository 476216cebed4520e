"""k-nearest-neighbor stages over an embedding column (SURVEY.md §2.3 Q4 +
the similarity-search requirement of large-scale training pipelines).

Brute-force exact path = the reference's ExactQuery (ExactQuery.scala:18-50):
score every corpus vector against a broadcast query matrix, one numpy matmul
per batch, keep a per-batch partial top-k per query (so the shuffle moves
O(n_queries * k) rows per block, not the whole score matrix), then a final
per-query ``groupby.map_groups`` top-k — the distributed analogue of ES's
per-shard top-k then global merge (SURVEY.md §3.2 step 5).

Scores use the reference's cosine convention: 1 + cos ∈ [0, 2]
(ExactModel.java:36-38).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


#: empty (query_id, neighbor_id, score) block — returned when a batch has no
#: scoreable rows (e.g. every row's vector was null).
_EMPTY_SCORED = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
    }
)


def drop_null_vectors(batch: pa.Table, col: str = "embedding") -> pa.Table:
    """Rows whose vector is null are invisible to vector search — the
    reference's semantics for docs indexed without the vector field
    (DocsWithMissingVectorsSuite.scala:20-63, issues #180/#181: such docs
    are skipped by exact and LSH queries, never errors).  No-op (one
    null_count read) on fully-valid batches."""
    c = batch.column(col)
    if c.null_count:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(c))
    return batch


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (N, dims) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # A null list element contributes no child values, so reshape would
        # silently misalign every later row — fail loudly instead; corpus
        # ingest sites filter via drop_null_vectors.
        raise ValueError(
            "null vectors reached _to_matrix; filter with drop_null_vectors"
        )
    # .values ignores a slice offset AND trailing child values past the last
    # list (a zero-offset slice of a longer ListArray still over-reads) —
    # flatten() honors both and is zero-copy for offset-0 unsliced arrays.
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """Actor-pool batch scorer: holds the (normalized) broadcast query matrix."""

    def __init__(self, queries_ref, k: int, exclude_self: bool = True):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["ids"], dtype=np.int64)
        qm = np.asarray(q["matrix"], dtype=np.float64)
        norms = np.linalg.norm(qm, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.qn = qm / norms
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        if batch.num_rows == 0:
            return _EMPTY_SCORED
        ids = batch.column("vec_id").to_numpy()
        m = _to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = 1.0 + self.qn @ (m / norms).T  # (n_queries, n_batch)
        nq, nb = scores.shape
        k = min(self.k + (1 if self.exclude_self else 0), nb)
        # per-batch partial top-k per query — flat emission, no per-query
        # Python loop (row order within the partial is irrelevant: the
        # final topk_per_query merge sorts globally)
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        q_ix = np.repeat(np.arange(nq), part.shape[1])
        cand = part.reshape(-1)
        qid = self.query_ids[q_ix]
        nid = ids[cand]
        sc = scores[q_ix, cand]
        if self.exclude_self:
            keep = nid != qid
            qid, nid, sc = qid[keep], nid[keep], sc[keep]
        return pa.table(
            {
                "query_id": pa.array(qid.astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(nid.astype(np.int64), pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )


def knn_exact(embeddings, query_ids_matrix: dict, k: int, *, concurrency=(1, 8)):
    """embeddings(vec_id, embedding) → (query_id, rank, neighbor_id, score).

    ``query_ids_matrix`` = {"ids": (Q,), "matrix": (Q, dims)} — broadcast once
    via ``ray.put`` and read in each actor's ``__init__`` (never re-shipped
    per batch).  Deterministic tie-break: (-score, neighbor_id).
    """
    ref = ray.put(query_ids_matrix)
    partials = embeddings.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
    # vectorized many-queries-per-partition final merge (no per-query pandas;
    # self-hits already dropped in BruteForceTopK)
    return topk_per_query(partials, k, exclude_self=True)


def knn_exact_metric(embeddings, query_ids_matrix: dict, k: int, metric: str):
    """Brute-force kNN under the reference's L1/L2 score conventions
    (ExactModel.java:26-33: score = 1/(1+dist)); same broadcast + partial
    top-k shape as the cosine path.  ``metric`` in {"l1", "l2"}."""
    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)

    def score_batch(batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        if batch.num_rows == 0:
            return _EMPTY_SCORED
        ids = batch.column("vec_id").to_numpy()
        m = _to_matrix(batch.column("embedding"))
        if metric == "l2":
            # ||q - x||^2 = |q|^2 - 2 q.x + |x|^2, sqrt at the end
            d2 = (
                (qm * qm).sum(axis=1)[:, None]
                - 2.0 * (qm @ m.T)
                + (m * m).sum(axis=1)[None, :]
            )
            dist = np.sqrt(np.maximum(d2, 0.0))
        elif metric == "l1":
            # Chunk over queries so the (Qc, batch, dims) abs-diff tensor
            # stays ~256 MB regardless of wave size — the unchunked form is
            # ~250 GB at (10k queries, 4096-row batches, 768 dims).
            nb_rows, dims = m.shape
            qc = max(1, int((32 << 20) // max(1, nb_rows * dims)))
            dist = np.empty((qm.shape[0], nb_rows), dtype=np.float64)
            for s in range(0, qm.shape[0], qc):
                e = min(s + qc, qm.shape[0])
                dist[s:e] = np.abs(qm[s:e, None, :] - m[None, :, :]).sum(axis=2)
        else:
            raise ValueError(metric)
        scores = 1.0 / (1.0 + dist)
        nq, nb = scores.shape
        kk = min(k + 1, nb)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        q_ix = np.repeat(np.arange(nq), part.shape[1])
        cand = part.reshape(-1)
        qid = query_ids[q_ix]
        nid = ids[cand]
        sc = scores[q_ix, cand]
        keep = nid != qid
        qid, nid, sc = qid[keep], nid[keep], sc[keep]
        return pa.table(
            {
                "query_id": pa.array(qid.astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(nid.astype(np.int64), pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )

    partials = embeddings.map_batches(
        score_batch, batch_format="pyarrow", batch_size=4096
    )
    return topk_per_query(partials, k, exclude_self=True)


class QueryHashIndex:
    """Sorted flat query-band-hash table with equal-key run lengths — the
    engine's analogue of seeking the query's terms in the postings dict
    (MatchHashesAndScoreQuery.java:52-85), shared by the dense and sparse
    LSH read paths.  A hash value can be shared by several queries, so each
    run start stores the run length; searchsorted-left always lands on a
    run start."""

    def __init__(self, query_ids: np.ndarray, query_hashes: np.ndarray, *, _flat=None, _owner=None):
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        if _flat is None:
            _flat = np.ascontiguousarray(query_hashes).reshape(-1)
            _owner = np.repeat(np.arange(len(self.query_ids)), query_hashes.shape[1])
        flat, owner = _flat, _owner
        order = np.argsort(flat, kind="stable")
        self.flat_sorted = flat[order]
        self.owner_sorted = owner[order]
        self.order = order  # co-sort per-entry payloads with this permutation
        run_starts = np.flatnonzero(
            np.r_[True, self.flat_sorted[1:] != self.flat_sorted[:-1]]
        )
        self.run_len_at = np.zeros(len(self.flat_sorted), dtype=np.int64)
        self.run_len_at[run_starts] = np.diff(
            np.r_[run_starts, len(self.flat_sorted)]
        )

    @classmethod
    def from_ragged(cls, query_ids, offsets: np.ndarray, values: np.ndarray):
        """Build from ragged per-query hash lists (offsets/values layout) —
        the sparse-set form where each query owns a variable-length sorted
        shingle/band list."""
        owner = np.repeat(
            np.arange(len(offsets) - 1), np.diff(offsets)
        )
        return cls(query_ids, None, _flat=np.ascontiguousarray(values), _owner=owner)

    def expand_full(
        self, hashes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Flat corpus values → (query_index, input_row, flat_position) per
        collision; flat_position indexes the sorted query-entry arrays (use
        it to look up per-entry payloads such as term frequencies)."""
        e = np.empty(0, np.int64)
        if len(self.flat_sorted) == 0 or len(hashes) == 0:
            return e, e, e
        pos = np.minimum(
            np.searchsorted(self.flat_sorted, hashes), len(self.flat_sorted) - 1
        )
        hit = self.flat_sorted[pos] == hashes
        rows = np.flatnonzero(hit)
        hpos = pos[rows]
        counts = self.run_len_at[hpos]
        total = int(counts.sum())
        if total == 0:
            return e, e, e
        within_starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=within_starts[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(within_starts, counts)
        owner_ix = np.repeat(hpos, counts) + within
        return self.owner_sorted[owner_ix], np.repeat(rows, counts), owner_ix

    def expand_indices(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Flat corpus values → (query_index, input_row) per collision, where
        query_index indexes ``query_ids`` and input_row indexes ``hashes``."""
        q_ix, rows, _ = self.expand_full(hashes)
        return q_ix, rows

    def expand(self, hashes: np.ndarray, doc_of_row: np.ndarray) -> pa.Table:
        """(flat corpus band hashes, owning doc per row) → exploded
        (query_id, neighbor_id) collision rows."""
        q_ix, rows = self.expand_indices(hashes)
        return pa.table(
            {
                "query_id": pa.array(self.query_ids[q_ix], pa.int64()),
                "neighbor_id": pa.array(doc_of_row[rows], pa.int64()),
            }
        )


def _within_runs(keys: np.ndarray) -> np.ndarray:
    """Position of each element within its run of equal keys (keys sorted)."""
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    run_lens = np.diff(np.r_[starts, len(keys)])
    return np.arange(len(keys), dtype=np.int64) - np.repeat(starts, run_lens)


def _kth_greatest_mask(
    uq: np.ndarray, nb: np.ndarray, cnt: np.ndarray, candidates: int, nq: int
) -> np.ndarray:
    """Vectorized multi-query kthGreatest (ArrayHitCounter.java:55-84):
    keep, per query, every pair with count > kth (the ``candidates``-th
    greatest count) plus count == kth ties by ascending neighbor_id up to
    the budget.  Histogram selection — O(P + nq * max_count); the only sort
    touches threshold-tie rows.  ``uq`` must be dense query indices in
    [0, nq)."""
    if len(cnt) == 0:
        return np.zeros(0, dtype=bool)
    cmax = int(cnt.max())
    hist = np.bincount(
        uq * np.int64(cmax + 1) + cnt, minlength=nq * (cmax + 1)
    ).reshape(nq, cmax + 1)
    # rev[q, c] = number of pairs with count >= c, c in 0..cmax+1
    rev = np.zeros((nq, cmax + 2), dtype=np.int64)
    rev[:, :cmax + 1] = hist[:, ::-1].cumsum(axis=1)[:, ::-1]
    # kth[q] = largest c >= 1 with rev[q, c] >= candidates, else 0 (keep all)
    ge = rev[:, 1 : cmax + 1] >= candidates  # columns are c = 1..cmax
    any_ge = ge.any(axis=1)
    kth = np.where(any_ge, cmax - np.argmax(ge[:, ::-1], axis=1), 0)
    mask = cnt > kth[uq]
    tie_rows = np.flatnonzero((kth[uq] > 0) & (cnt == kth[uq]))
    if len(tie_rows):
        rem = candidates - rev[np.arange(nq), np.minimum(kth + 1, cmax + 1)]
        order = np.lexsort((nb[tie_rows], uq[tie_rows]))
        t_sorted = tie_rows[order]
        within = _within_runs(uq[t_sorted])
        mask[t_sorted[within < rem[uq[t_sorted]]]] = True
    return mask


def _coarse_query_key(ds, n_parts: int):
    """Append ``part = query_id % n_parts`` — the coarse shuffle key every
    per-query merge shares (many queries per partition, vectorized kernels,
    no per-group Python)."""

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pa.array(
                t.column("query_id").to_numpy(zero_copy_only=False)
                % np.int64(n_parts),
                pa.int64(),
            ),
        )

    return ds.map_batches(add_part, batch_format="pyarrow")


def topk_per_query(scored, k: int, *, exclude_self: bool = True, n_parts: int = 32):
    """(query_id, neighbor_id, score) → (query_id, rank, neighbor_id, score)
    global per-query top-k with the deterministic (-score, neighbor_id)
    tie-break — the final merge every kNN path shares.  One coarse-keyed
    shuffle; the group kernel handles MANY queries per partition in a single
    lexsort (no per-query pandas UDF)."""

    def kern(t: pa.Table) -> pa.Table:
        qi = t.column("query_id").to_numpy(zero_copy_only=False)
        ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sc = t.column("score").to_numpy(zero_copy_only=False)
        if exclude_self:
            m = ni != qi
            qi, ni, sc = qi[m], ni[m], sc[m]
        if len(qi) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((ni, -sc, qi))
        within = _within_runs(qi[order])
        keep = order[within < k]
        return pa.table(
            {
                "query_id": pa.array(qi[keep], pa.int64()),
                "rank": pa.array(within[within < k] + 1, pa.int64()),
                "neighbor_id": pa.array(ni[keep], pa.int64()),
                "score": pa.array(sc[keep], pa.float64()),
            }
        )

    return (
        _coarse_query_key(scored, n_parts)
        .groupby("part")
        .map_groups(
            lambda t: kern(t.drop_columns(["part"])), batch_format="pyarrow"
        )
    )


def count_cut_partials(
    bands, qindex: "QueryHashIndex", candidates: int, *, partial_cut: bool = True
):
    """Band blocks (doc_id, band_hash) → per-block (query_id, neighbor_id,
    n_bands) collision counts.

    With ``partial_cut=True`` (the default) each block's counts are also cut
    to ``candidates`` per query — a superset of the global cut ONLY under the
    doc-contiguity invariant: each doc's L exploded rows live in one block
    (the direct output of one map_batches over the embedding blocks), so
    per-block counts are COMPLETE.  This is the shared first half of the
    one-shuffle LSH read path (countHits + a partial kthGreatest,
    MatchHashesAndScoreQuery.java:52-85 / ArrayHitCounter.java:55-84).

    Pass ``partial_cut=False`` when the band stream is NOT doc-contiguous
    (e.g. the bucket-partitioned on-disk seek index scatters a doc's rows
    across bucket dirs): blocks then emit uncut per-block counts — still a
    per-block combiner (unique (query, doc) pairs, not raw collisions) —
    and the cut happens only after :func:`merge_cut_candidates` sums them,
    preserving exact kthGreatest semantics."""

    def count_cut(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        q_ix, rows = qindex.expand_indices(bh)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "n_bands": pa.array([], pa.int64()),
            }
        )
        if len(q_ix) == 0:
            return empty
        # O(E) doc factorization: ``rows`` is ascending and band tables are
        # doc-major (each doc's L rows contiguous), so docs[rows] is
        # run-per-doc — change-point coding replaces a full np.unique sort.
        # On a NON-doc-major stream a doc yields several runs; with
        # partial_cut=False the merge stage sums them (correct), and with
        # partial_cut=True the duplicate (query, doc) runs are summed below
        # BEFORE the cut so the per-block kthGreatest never sees split
        # partial counts.
        dr = docs[rows]
        change = np.r_[True, dr[1:] != dr[:-1]]
        run_ix = np.cumsum(change) - 1
        udoc = dr[change]
        n_runs = len(udoc)
        nq = len(qindex.query_ids)
        key = q_ix * np.int64(n_runs) + run_ix
        if nq * n_runs <= 64_000_000:
            # counting sort: one O(E) bincount over compacted (query, run)
            # codes — no O(E log E) sort ever touches the collision stream
            flat = np.bincount(key, minlength=nq * n_runs)
            nz = np.flatnonzero(flat)
            cnt = flat[nz]
            uq = nz // n_runs
            nb = udoc[nz % n_runs]
        else:  # huge query waves: fall back to the sort-based unique
            ukey, cnt = np.unique(key, return_counts=True)
            uq = ukey // n_runs
            nb = udoc[ukey % n_runs]
        if partial_cut:
            # Contiguity guard: if any doc spans multiple runs (the block
            # was not doc-major — e.g. user-supplied corpus_bands), a
            # (query, doc) pair's count is split across runs and cutting
            # the split partials could drop a pair whose in-block sum
            # survives the kthGreatest.  Sum duplicates first; on
            # doc-major blocks every doc is exactly one run and this is
            # a cheap O(n_runs log n_runs) no-op check.
            if len(np.unique(udoc)) != n_runs:
                uniq_docs, dcode = np.unique(nb, return_inverse=True)
                nd = np.int64(len(uniq_docs))
                ukey2, inv = np.unique(uq * nd + dcode, return_inverse=True)
                cnt = np.bincount(inv, weights=cnt).astype(np.int64)
                uq = (ukey2 // nd).astype(np.int64)
                nb = uniq_docs[ukey2 % nd]
            keep = _kth_greatest_mask(uq, nb, cnt, candidates, nq)
            uq, nb, cnt = uq[keep], nb[keep], cnt[keep]
        return pa.table(
            {
                "query_id": pa.array(qindex.query_ids[uq], pa.int64()),
                "neighbor_id": pa.array(nb, pa.int64()),
                "n_bands": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return bands.map_batches(count_cut, batch_format="pyarrow", batch_size=None)


def count_cut_partials_sorted(
    bands, qindex: "QueryHashIndex", candidates: int, *, merge_parts: int | None = None
):
    """Seek-style collision counting over hash-SORTED postings blocks
    (:func:`_sort_band_block` layout): per block, the Q*L query hash entries
    binary-search into the sorted corpus hashes and only the actual
    collision runs are expanded — O(Q*L*log M + E) per block instead of the
    scan path's O(M*log(Q*L)), the in-memory analogue of seeking the query's
    terms in the postings dict (MatchHashesAndScoreQuery.java:52-85).  Every
    row of a doc lives in the block (sorting is within-block), so per-block
    counts are complete and the partial kthGreatest cut is exact.

    ``merge_parts``: when set, each output block is sorted part-major by
    ``query_id % merge_parts`` with the slice offsets attached as schema
    metadata, so the downstream broadcast merge tasks zero-copy SLICE their
    query stripe instead of boolean-filtering every block — removing the
    per-task modulo+filter pass and, on same-node reads, touching only the
    stripe's plasma pages.  (A REMOTE ray.get still transfers the whole
    block — cross-node merges above the size gate go through the groupby
    shuffle fallback, which moves only each partition's rows.)"""
    import ray as _ray

    # ship the query hash index by REF, not inside the closure: the closure
    # is re-pickled into every wave's task specs, and the index is ~MBs at
    # real wave sizes (one plasma copy per node instead)
    qindex_ref = _ray.put(qindex)

    def count_cut(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qindex = _ray.get(qindex_ref)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "n_bands": pa.array([], pa.int64()),
            }
        )
        bh_s = batch.column("band_hash").to_numpy(zero_copy_only=False)
        if len(bh_s) == 0 or len(qindex.flat_sorted) == 0:
            return empty
        dloc = batch.column("doc_local").to_numpy(zero_copy_only=False)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        qf, qo = qindex.flat_sorted, qindex.owner_sorted
        lo = np.searchsorted(bh_s, qf, side="left")
        hi = np.searchsorted(bh_s, qf, side="right")
        lens = hi - lo
        e_total = int(lens.sum())
        if e_total == 0:
            return empty
        hit = lens > 0
        n_docs = int(dloc.max()) + 1
        nq = len(qindex.query_ids)
        # int32 expansion temporaries: positions index one block (< 2^31
        # rows) and, on the bincount branch, keys are < nq*n_docs <= 64M —
        # halves the memory traffic of the E-sized arrays
        small = e_total < 2**31 - 1 and nq * n_docs <= 64_000_000
        idt = np.int32 if small else np.int64
        lh, lnh, qoh = lo[hit].astype(idt), lens[hit].astype(idt), qo[hit]
        starts = np.zeros(len(lnh), dtype=idt)
        np.cumsum(lnh[:-1], out=starts[1:])
        within = np.arange(e_total, dtype=idt) - np.repeat(starts, lnh)
        pos = np.repeat(lh, lnh) + within
        q_ix = np.repeat(qoh.astype(idt), lnh)
        key = q_ix * idt(n_docs) + dloc[pos].astype(idt, copy=False)
        if small:
            flat = np.bincount(key, minlength=nq * n_docs)
            nz = np.flatnonzero(flat)
            cnt = flat[nz]
            uq = nz // n_docs
            nb_loc = nz % n_docs
        else:
            ukey, cnt = np.unique(key, return_counts=True)
            uq = ukey // n_docs
            nb_loc = ukey % n_docs
        udoc = np.empty(n_docs, dtype=np.int64)
        udoc[dloc] = did
        nb = udoc[nb_loc]
        keep = _kth_greatest_mask(uq, nb, cnt, candidates, nq)
        uq, nb, cnt = uq[keep], nb[keep], cnt[keep]
        qid = qindex.query_ids[uq]
        cnt64 = cnt.astype(np.int64)
        if merge_parts:
            part = qid % merge_parts
            order = np.argsort(part, kind="stable")
            qid, nb, cnt64 = qid[order], nb[order], cnt64[order]
            offs = np.zeros(merge_parts + 1, dtype=np.int64)
            np.cumsum(np.bincount(part, minlength=merge_parts), out=offs[1:])
            return pa.table(
                {
                    "query_id": pa.array(qid, pa.int64()),
                    "neighbor_id": pa.array(nb, pa.int64()),
                    "n_bands": pa.array(cnt64, pa.int64()),
                }
            ).replace_schema_metadata(
                {
                    b"merge_parts": str(merge_parts).encode(),
                    b"part_offsets": offs.tobytes(),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "neighbor_id": pa.array(nb, pa.int64()),
                "n_bands": pa.array(cnt64, pa.int64()),
            }
        )

    return bands.map_batches(count_cut, batch_format="pyarrow", batch_size=None)


def sort_band_blocks(bands):
    """Doc-major exploded band table → hash-sorted postings blocks (the
    :func:`_sort_band_block` layout).  Materialize the result once and pass
    it as ``corpus_bands`` to any LSH read path for seek-style counting."""
    return bands.map_batches(
        _sort_band_block, batch_format="pyarrow", batch_size=None
    )


def count_cut_partials_auto(
    bands, qindex: "QueryHashIndex", candidates: int, *, partial_cut: bool = True
):
    """Dispatch on the band-table layout: hash-sorted postings blocks
    (``doc_local`` column present) seek; plain exploded band tables scan."""
    if "doc_local" in bands.schema().names:
        return count_cut_partials_sorted(bands, qindex, candidates)
    return count_cut_partials(bands, qindex, candidates, partial_cut=partial_cut)


def merge_cut_candidates(partials, candidates: int, *, n_parts: int = 32):
    """ONE coarse-keyed shuffle merging the per-block partial counts into the
    global per-query candidate cut (kthGreatest semantics: ``candidates``
    highest collision counts, ties by neighbor_id).  Any (query, doc) pair
    split across blocks is summed first — a no-op under the doc-contiguity
    invariant, correctness insurance without it."""

    def merge_cut(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "n_bands": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qi = t.column("query_id").to_numpy(zero_copy_only=False)
        ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        nb = t.column("n_bands").to_numpy(zero_copy_only=False)
        o = np.lexsort((ni, qi))
        qs, ns, nbs = qi[o], ni[o], nb[o]
        newg = np.r_[True, (qs[1:] != qs[:-1]) | (ns[1:] != ns[:-1])]
        total = np.add.reduceat(nbs, np.flatnonzero(newg))
        uq, un = qs[newg], ns[newg]
        order = np.lexsort((un, -total, uq))
        keep = order[_within_runs(uq[order]) < candidates]
        return pa.table(
            {
                "query_id": pa.array(uq[keep], pa.int64()),
                "neighbor_id": pa.array(un[keep], pa.int64()),
                "n_bands": pa.array(total[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        _coarse_query_key(partials, n_parts)
        .groupby("part")
        .map_groups(
            lambda t: merge_cut(t.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )


class BandIndex:
    """Materialized band postings + stored vectors — the engine's analogue
    of a Lucene segment (postings dict + doc values; HashingQuery.index,
    HashingQuery.scala:88-99, StoredVecReader.scala:8-27).  Build once,
    query many times.  ``metric`` selects the exact re-score kernel
    ("cosine" → 1+cos, "l2" → 1/(1+dist); ExactModel.java:26-38).

    Invariant the fast read path relies on: ``bands`` blocks are
    DOC-CONTIGUOUS (each doc's L exploded rows live in one block, the
    direct output of one map_batches over the embedding blocks), so
    per-block (query, doc) collision counts are COMPLETE — no cross-block
    aggregation shuffle is needed before the candidate cut."""

    def __init__(self, bands, lsh, vec_refs, metric: str = "cosine", sorted_vec_ref=None):
        self.bands = bands
        self.lsh = lsh
        self.vec_refs = vec_refs
        self.metric = metric
        #: ObjectRef to (shard_start_ids, [shard refs]) — the id-sorted
        #: re-score matrix built ONCE by a build-time task and sharded by
        #: id range (~64 MB/shard); readers fetch only the shards their
        #: candidates hit, zero-copy from the object store, instead of
        #: each re-gathering and re-sorting the corpus (N workers x
        #: full-corpus vstack+argsort was the dominant first-query cost;
        #: the pre-r5 single whole-corpus object pinned the full matrix
        #: on every reading node)
        self.sorted_vec_ref = sorted_vec_ref


#: backwards-compatible name (pre-r4 the index was cosine-only)
CosineBandIndex = BandIndex


def _sort_band_block(t: pa.Table) -> pa.Table:
    """Doc-major exploded band block (each doc exactly L contiguous rows) →
    hash-SORTED postings block: (band_hash sorted, doc_id co-sorted,
    doc_local co-sorted compact code = original row // L).  Sorting is
    within-block, so every row of a doc still lives in one block — per-block
    counts stay complete and the partial kthGreatest cut stays exact."""
    bh = t.column("band_hash").to_numpy(zero_copy_only=False)
    docs = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(bh)
    if n == 0:
        return pa.table(
            {
                "band_hash": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
                "doc_local": pa.array([], pa.int32()),
            }
        )
    # rows arrive doc-major (np.repeat(ids, L)); L from the row/doc ratio
    n_docs = len(np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]]))
    L = n // n_docs
    order = np.argsort(bh, kind="stable")
    return pa.table(
        {
            "band_hash": pa.array(bh[order], pa.uint64()),
            "doc_id": pa.array(docs[order], pa.int64()),
            "doc_local": pa.array((order // L).astype(np.int32), pa.int32()),
        }
    )


def _build_band_index(embeddings, lsh, bands_fn, metric, num_blocks) -> BandIndex:
    emb = embeddings.select_columns(["vec_id", "embedding"])
    if num_blocks:
        # the count stage parallelizes per band BLOCK: a small corpus read
        # from one Arrow table would otherwise collapse to 2-3 fat blocks
        # and starve the CPUs (at 100 TB the read supplies plenty of blocks
        # and this repartition is a no-op to request)
        emb = emb.repartition(num_blocks)
    emb = emb.materialize()
    bands = emb.map_batches(
        bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow",
        batch_size=4096,
    ).map_batches(
        _sort_band_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    vec_refs = emb.to_arrow_refs()
    # gather/sort/normalize the stored vectors ONCE, off-driver; the ref
    # resolves lazily so the build does not block on it
    sorted_ref = _gather_sorted_task.remote(vec_refs, metric, _RESCORE_SHARD_BYTES)
    return BandIndex(
        bands=bands, lsh=lsh, vec_refs=vec_refs, metric=metric,
        sorted_vec_ref=sorted_ref,
    )


def build_cosine_band_index(embeddings, lsh, *, num_blocks: int | None = None) -> BandIndex:
    """embeddings → cosine BandIndex.  The stored vectors stay in the object
    store as the materialized embedding blocks' refs (one copy cluster-wide;
    readers map them zero-copy)."""
    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn

    return _build_band_index(embeddings, lsh, cosine_bands_fn, "cosine", num_blocks)


def build_l2_band_index(embeddings, lsh, *, num_blocks: int | None = None) -> BandIndex:
    """embeddings → L2 BandIndex (stable-distribution bands,
    L2LshModel.java:70-82); same segment model as the cosine index."""
    from elastiknn_ray.stages.float_lsh import l2_bands_fn

    return _build_band_index(embeddings, lsh, l2_bands_fn, "l2", num_blocks)


#: worker-process cache of gathered stored vectors, keyed by the ref tuple:
#: (sorted ids, normalized matrix) built once per worker, reused across
#: query waves (the reference's per-node segment reader reuse).
_VEC_CACHE: dict = {}


def _sort_gathered(tables, metric: str) -> tuple[np.ndarray, np.ndarray]:
    """(vec_id, embedding) tables → (sorted ids, id-sorted re-score matrix).

    The matrix keeps the SOURCE dtype (float32 corpora stay float32 — half
    the shared-object footprint and gather traffic; the rescore kernel
    upcasts each chunk to float64, which is value-identical to upcasting
    the whole matrix first).  Cosine normalization happens in the kernel
    after the upcast — same per-row float64 arithmetic as normalizing the
    full matrix, so scores are bit-identical to the previous layout."""
    ids_parts, mats = [], []
    for t in tables:
        t = drop_null_vectors(t)
        if t.num_rows == 0:
            continue
        ids_parts.append(t.column("vec_id").to_numpy(zero_copy_only=False))
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # flatten(), never .values: a zero-offset slice of a longer
        # ListArray still carries trailing child values that .values
        # would include, mis-shaping the matrix.
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mats.append(flat.reshape(len(col), -1))
    if not ids_parts:
        return (np.empty(0, np.int64), np.empty((0, 0)))
    ids = np.concatenate(ids_parts)
    m = np.vstack(mats)
    order = np.argsort(ids, kind="stable")
    return (ids[order], m[order])


#: target plasma-object size for one rescore-matrix shard.  Small enough
#: that a merge task resident set is ∝ the shards its candidates hit (not
#: the corpus); large enough that a 60k x 784d f32 corpus is only ~3
#: objects (negligible dispatch overhead at this scale).
_RESCORE_SHARD_BYTES = 64 * 1024 * 1024


@ray.remote(num_cpus=1)
def _gather_sorted_task(vec_refs, metric: str, shard_bytes: int):
    """One cluster-wide gather+sort of the stored vectors, SHARDED by
    contiguous id range: returns (shard_start_ids, [shard ObjectRefs]),
    each shard an (ids slice, matrix slice) plasma object.  Merge tasks
    fetch only the shards their candidate ids hit, so a node's resident
    set is bounded by shards-touched rather than corpus size (the r4
    single-object layout pinned the whole matrix on every reading node).
    ``shard_bytes`` is passed from the DRIVER (not read from this module's
    globals) — a remote function's globals are frozen at first export, so a
    module-level read here would ignore later driver-side changes."""
    ids, mat = _sort_gathered(ray.get(list(vec_refs)), metric)
    n = len(ids)
    if n == 0:
        return (np.full(1, np.iinfo(np.int64).min, np.int64), [ray.put((ids, mat))])
    n_shards = max(1, min(n, -(-mat.nbytes // shard_bytes)))
    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    refs = [
        ray.put((ids[s:e], np.ascontiguousarray(mat[s:e])))
        for s, e in zip(bounds[:-1], bounds[1:])
    ]
    starts = ids[bounds[:-1]].copy()
    # shard 0 catches everything from below (candidate ids always come
    # from this corpus's postings, so this is belt-and-braces)
    starts[0] = np.iinfo(np.int64).min
    return (starts, refs)


def _gathered_vectors(vec_refs, metric: str = "cosine") -> tuple[np.ndarray, np.ndarray]:
    key = (metric,) + tuple(r.hex() for r in vec_refs)
    hit = _VEC_CACHE.get(key)
    if hit is not None:
        return hit
    out = _sort_gathered(ray.get(list(vec_refs)), metric)
    _VEC_CACHE.clear()  # hold at most one corpus per worker
    _VEC_CACHE[key] = out
    return out


#: per-worker-process scratch for the chunked candidate rescore, keyed by
#: dims.  A merge task rescoring 10k+ candidates would otherwise allocate
#: three fresh (rows, dims) float64 temporaries (~100 MB each at 784d) whose
#: first-touch page faults cost more than the arithmetic; reusing one pair
#: of chunk buffers across tasks in the same worker removes that entirely.
_RESCORE_CHUNK = 2048
_RESCORE_SCRATCH: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _rescore_gathered(
    qm: np.ndarray, qix: np.ndarray, mat: np.ndarray, vix: np.ndarray,
    metric: str,
) -> np.ndarray:
    """score[i] = exact similarity of (qm[qix[i]], mat[vix[i]]) under the
    reference conventions (cosine: 1+cos, ``mat`` rows normalized here
    after the float64 upcast; l1/l2: 1/(1+dist)) — evaluated in fixed-size
    chunks through process-cached scratch so no O(rows x dims) temporary is
    ever allocated.  ``mat`` may be float32 (the stored corpus dtype):
    upcasting a gathered chunk then normalizing is value-identical to
    upcasting + normalizing the whole matrix up front."""
    n, dims = len(qix), qm.shape[1]
    key = (dims, mat.dtype.str)
    buf = _RESCORE_SCRATCH.get(key)
    if buf is None:
        buf = (
            np.empty((_RESCORE_CHUNK, dims), np.float64),
            np.empty((_RESCORE_CHUNK, dims), np.float64),
            np.empty((_RESCORE_CHUNK, dims), mat.dtype),
        )
        _RESCORE_SCRATCH.clear()  # at most one (dims, dtype) shape per worker
        _RESCORE_SCRATCH[key] = buf
    bq, bv, braw = buf
    direct = mat.dtype == np.float64
    score = np.empty(n, np.float64)
    for s in range(0, n, _RESCORE_CHUNK):
        e = min(s + _RESCORE_CHUNK, n)
        m = e - s
        np.take(qm, qix[s:e], axis=0, out=bq[:m])
        if direct:
            np.take(mat, vix[s:e], axis=0, out=bv[:m])
        else:
            np.take(mat, vix[s:e], axis=0, out=braw[:m])
            bv[:m] = braw[:m]  # upcast copy
        if metric == "cosine":
            # np.linalg.norm, matching the previous whole-matrix
            # normalization bit-for-bit (same reduction routine per row)
            norms = np.linalg.norm(bv[:m], axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            bv[:m] /= norms
            score[s:e] = 1.0 + np.einsum("ij,ij->i", bq[:m], bv[:m])
        elif metric == "l1":
            np.subtract(bq[:m], bv[:m], out=bq[:m])
            np.abs(bq[:m], out=bq[:m])
            score[s:e] = 1.0 / (1.0 + bq[:m].sum(axis=1))
        else:
            np.subtract(bq[:m], bv[:m], out=bq[:m])
            score[s:e] = 1.0 / (
                1.0 + np.sqrt(np.einsum("ij,ij->i", bq[:m], bq[:m]))
            )
    return score


def _knn_lsh_indexed(
    index: BandIndex,
    query_ids: np.ndarray,
    qm: np.ndarray,
    qindex: "QueryHashIndex",
    k: int,
    candidates: int,
):
    """Fast indexed read path (any band metric): ONE pass over
    doc-contiguous band blocks computing complete per-block (query, doc)
    collision counts + a partial per-query cut, then a single per-query
    shuffle whose group UDF merges the partials, cuts to ``candidates``,
    exact-re-scores against the cached stored vectors and emits the top-k.
    One shuffle total, and the shuffled rows are already cut to
    O(blocks * Q * candidates)."""
    metric = index.metric
    if metric == "cosine":
        qnorms = np.linalg.norm(qm, axis=1, keepdims=True)
        qnorms[qnorms == 0] = 1.0
        q_ref = ray.put({"ids": query_ids, "qm": qm / qnorms})
    else:
        q_ref = ray.put({"ids": query_ids, "qm": np.asarray(qm, dtype=np.float64)})
    vec_refs = index.vec_refs
    sorted_ref = getattr(index, "sorted_vec_ref", None)

    # final merge: ONE coarse-keyed shuffle (~n_parts partitions, each
    # handling many queries in one fully-vectorized kernel — no per-group
    # Python), cut → rescore → top-k inside the kernel
    n_parts = 32

    if "doc_local" in index.bands.schema().names:
        # hash-sorted postings layout: seek, don't scan; emit part-major
        # blocks so the broadcast merge slices instead of filtering
        partials = count_cut_partials_sorted(
            index.bands, qindex, candidates, merge_parts=n_parts
        )
    else:
        partials = count_cut_partials(index.bands, qindex, candidates)

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
        qd = ray.get(q_ref)
        q_sorted_ix = np.argsort(qd["ids"], kind="stable")
        qix = q_sorted_ix[np.searchsorted(qd["ids"][q_sorted_ix], qi)]
        # exact re-score against the shared pre-sorted stored vectors —
        # sharded by id range: fetch ONLY the shards the candidates hit
        # (zero-copy plasma reads; fallback re-gathers per worker process).
        # Scores are row-independent, so per-shard evaluation scattered
        # back through the mask is bit-identical to the single-matrix path.
        if sorted_ref is not None:
            starts, shard_refs = ray.get(sorted_ref)
            shard_of = np.searchsorted(starts, ni, side="right") - 1
            score = np.empty(len(ni), np.float64)
            for sh in np.unique(shard_of):
                m = shard_of == sh
                ids_s, mat = ray.get(shard_refs[sh])
                vix = np.searchsorted(ids_s, ni[m])
                score[m] = _rescore_gathered(qd["qm"], qix[m], mat, vix, metric)
        else:
            ids_s, mat = _gathered_vectors(vec_refs, metric)
            vix = np.searchsorted(ids_s, ni)
            score = _rescore_gathered(qd["qm"], qix, mat, vix, metric)
        # self-exclusion + per-query top-k with (score desc, neighbor) ties
        m = ni != qi
        qi, ni, score = qi[m], ni[m], score[m]
        order = np.lexsort((ni, -score, qi))
        within = _within_runs(qi[order])
        keep = order[within < k]
        rank = within[within < k] + 1
        return pa.table(
            {
                "query_id": pa.array(qi[keep], pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "neighbor_id": pa.array(ni[keep], pa.int64()),
                "score": pa.array(score[keep], pa.float64()),
            }
        )

    return broadcast_or_shuffle_merge(partials, n_parts, merge_rescore_topk)


@ray.remote(num_cpus=1)
def _merge_part_task(part_ix: int, n_parts: int, refs, kernel):
    tabs = ray.get(list(refs))
    sel = []
    for tb in tabs:
        if tb.num_rows == 0:
            continue
        meta = tb.schema.metadata or {}
        mp = meta.get(b"merge_parts")
        if mp is not None and int(mp) == n_parts:
            # part-major block: zero-copy slice of this task's query stripe
            # (plasma pages outside the stripe are never touched)
            offs = np.frombuffer(meta[b"part_offsets"], dtype=np.int64)
            s, e = int(offs[part_ix]), int(offs[part_ix + 1])
            if e > s:
                sel.append(tb.slice(s, e - s))
            continue
        qp = tb.column("query_id").to_numpy(zero_copy_only=False)
        mask = (qp % np.int64(n_parts)) == part_ix
        if mask.any():
            sel.append(tb.filter(pa.array(mask)))
    if not sel:
        return kernel(pa.table({}))
    return kernel(pa.concat_tables(sel))


def broadcast_or_shuffle_merge(partials, n_parts: int, kernel):
    """Per-query merge shared by the indexed read paths.  The partial set is
    bounded (blocks x Q x candidates rows), so the usual case skips the
    sort-based shuffle entirely: n_parts plain tasks each map ALL partial
    blocks zero-copy from the object store and run ``kernel`` on their own
    query slice (query_id % n_parts) — an all-reads broadcast merge.  Above
    the size gate (huge block counts at cluster scale) fall back to the
    groupby shuffle."""
    parts_ds = partials.materialize()
    if parts_ds.size_bytes() <= 512 * 1024 * 1024:
        import ray.data as rd

        part_refs = parts_ds.to_arrow_refs()
        return rd.from_arrow_refs(
            [
                _merge_part_task.remote(i, n_parts, part_refs, kernel)
                for i in range(n_parts)
            ]
        )
    return (
        _coarse_query_key(parts_ds, n_parts)
        .groupby("part")
        .map_groups(
            lambda t: kernel(t.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )


def knn_lsh_cosine(
    embeddings,
    query_ids_matrix: dict,
    k: int,
    *,
    candidates: int = 100,
    lsh=None,
    concurrency=(1, 8),
    corpus_bands=None,
    rescore: bool = True,
    bands_doc_contiguous: bool = True,
):
    """Approximate cosine kNN — the reference's full read path (SURVEY.md
    §3.2): hash the query vectors once (ElastiknnQueryBuilder step 3), count
    per-doc band collisions (Q1, MatchHashesAndScoreQuery.countHits), cut to
    the top ``candidates`` per query by collision count (Q2, kthGreatest),
    exact-re-score only those (Q3) and return the global top-k.

    The corpus-side scan is one streaming map_batches: query band hashes are
    tiny and broadcast inside the task closure; collision counting is a
    searchsorted membership test.  The candidate cut is global-per-query
    (the reference's per-segment budget becomes a per-query budget —
    SURVEY.md §2.3 Q2 note).

    Pass ``corpus_bands`` (from :func:`build_cosine_band_index`) to skip
    re-hashing the corpus — the fit/query split of the reference's
    ann-benchmarks protocol (index built once before timing).
    """
    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.models.params import derive_hyperplanes

    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)
    if isinstance(corpus_bands, BandIndex):
        if corpus_bands.metric != "cosine":
            raise ValueError(
                f"index metric {corpus_bands.metric!r} != query metric 'cosine' "
                "(ElastiknnQueryBuilder.scala:38-92 compatibility check)"
            )
        if corpus_bands.lsh.dims != qm.shape[1]:
            raise ValueError(
                f"query dims {qm.shape[1]} != index dims {corpus_bands.lsh.dims} "
                "(ElastiknnQueryBuilder.scala:38-92 compatibility check)"
            )
        from elastiknn_ray.models.params import derive_hyperplanes
        from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes

        ilsh = corpus_bands.lsh
        planes = derive_hyperplanes(ilsh).planes.astype(np.float64)
        qh = hyperplane_band_hashes(qm, planes, ilsh.L, ilsh.k)
        qindex = QueryHashIndex(query_ids, qh)
        return _knn_lsh_indexed(corpus_bands, query_ids, qm, qindex, k, candidates)
    lsh = lsh or CosineLshConfig(dims=qm.shape[1], L=32, k=8, seed=0)
    if lsh.dims != qm.shape[1]:
        raise ValueError(
            f"query dims {qm.shape[1]} != mapping dims {lsh.dims} "
            "(ElastiknnQueryBuilder.scala:38-92 compatibility check)"
        )
    from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes

    planes = derive_hyperplanes(lsh).planes.astype(np.float64)
    qh = hyperplane_band_hashes(qm, planes, lsh.L, lsh.k)  # (Q, L)
    qindex = QueryHashIndex(query_ids, qh)

    # one-shuffle read path (shared with every LSH variant): hash each
    # corpus block in place → per-block complete counts + partial cut →
    # one coarse merge/cut shuffle (countHits → kthGreatest,
    # MatchHashesAndScoreQuery.java:52-130, in exactly one exchange)
    if corpus_bands is not None:
        bands = corpus_bands
    else:
        from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn

        bands = embeddings.map_batches(
            cosine_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow",
            batch_size=4096,
        )
    cand = merge_cut_candidates(
        count_cut_partials_auto(
            bands, qindex, candidates, partial_cut=bands_doc_contiguous
        ),
        candidates,
    )
    if not rescore:
        return _collision_score_topk(cand, k, lsh.L)
    return rescore_cosine_topk(cand, embeddings, query_ids, qm, k)


def _collision_score_topk(cand, k: int, n_tables: int):
    """Q5 score-function mode (no re-rank): score = matchingHashes /
    totalHashes — the reference's function_score variant, explicitly NOT
    exact-re-scored (HashingQuery.scala:40-83; the classic MinHash estimator
    when k=1).  Deterministic (score desc, neighbor_id) ordering via the
    shared vectorized topk_per_query merge."""

    def to_score(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": t.column("query_id"),
                "neighbor_id": t.column("neighbor_id"),
                "score": pa.array(
                    t.column("n_bands").to_numpy(zero_copy_only=False)
                    / np.float64(n_tables),
                    pa.float64(),
                ),
            }
        )

    scored = cand.map_batches(to_score, batch_format="pyarrow")
    return topk_per_query(scored, k, exclude_self=True)


def rescore_cosine_topk(
    cand,
    embeddings,
    query_ids: np.ndarray,
    qm: np.ndarray,
    k: int,
    *,
    metric: str = "cosine",
):
    """Exact re-score of candidate (query_id, neighbor_id) pairs + global
    per-query top-k (Q3 of the read path, shared by every ANN variant).
    ``metric``: "cosine" (score 1+cos) or "l2" (score 1/(1+dist),
    ExactModel.java:26-28).  Candidate embedding blocks stay in the object
    store; rescore actors read them zero-copy (same shard-refs pattern as
    the verify stages)."""
    if metric not in ("cosine", "l2"):
        raise ValueError(metric)
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
    import ray

    ids_ref = ray.put(cand_ids)

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = t.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return t.filter(pa.array(np.zeros(len(d), dtype=bool)))
        p = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[p] == d))

    hits_ds = (
        embeddings.map_batches(filt, batch_format="pyarrow").materialize()
    )
    if metric == "cosine":
        qnorms = np.linalg.norm(qm, axis=1, keepdims=True)
        qnorms[qnorms == 0] = 1.0
        qmat = qm / qnorms
    else:
        qmat = np.asarray(qm, dtype=np.float64)
    q_ref = ray.put({"ids": query_ids, "qm": qmat, "metric": metric})

    class _Rescore:
        def __init__(self, shard_refs, q_ref):
            tables = ray.get(list(shard_refs))
            qd = ray.get(q_ref)
            self.metric = qd["metric"]
            ids_parts, mats = [], []
            for t in tables:
                t = drop_null_vectors(t)
                if t.num_rows == 0:
                    continue
                ids_parts.append(t.column("vec_id").to_numpy(zero_copy_only=False))
                mats.append(_to_matrix(t.column("embedding")))
            if ids_parts:
                hid = np.concatenate(ids_parts)
                hmat = np.vstack(mats)
                ho = np.argsort(hid, kind="stable")
                self.hid = hid[ho]
                if self.metric == "cosine":
                    norms = np.linalg.norm(hmat, axis=1, keepdims=True)
                    norms[norms == 0] = 1.0
                    hmat = hmat / norms
                self.hn = hmat[ho]
            else:
                self.hid = np.empty(0, np.int64)
                self.hn = np.empty((0, 0))
            self.qn = qd["qm"]
            qids = qd["ids"]
            self.q_sorted = np.sort(qids)
            self.q_perm = np.argsort(qids, kind="stable")

        def __call__(self, t: pa.Table) -> pa.Table:
            qi = t.column("query_id").to_numpy(zero_copy_only=False)
            ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
            vix = np.searchsorted(self.hid, ni)
            qix = self.q_perm[np.searchsorted(self.q_sorted, qi)]
            if self.metric == "cosine":
                score = 1.0 + np.einsum("ij,ij->i", self.qn[qix], self.hn[vix])
            else:
                d = self.qn[qix] - self.hn[vix]
                score = 1.0 / (1.0 + np.sqrt(np.einsum("ij,ij->i", d, d)))
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
        },
        batch_format="pyarrow",
        batch_size=16384,
        concurrency=(1, 8),
    )
    return topk_per_query(scored, k, exclude_self=True)


def fetch_indexed_vectors(
    source, ids, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> dict:
    """Cross-table ``Vec.Indexed`` resolution
    (ElasticsearchQueryBuilder.scala:94-160: the indexed-vector query may
    point at a DIFFERENT index; the rewrite fetches the stored vector by id
    and re-plans with the literal).  ``source`` is a Parquet path/dir (read
    with predicate pushdown — only matching row groups leave storage) or a
    ``ray.data.Dataset``.  Returns the standard query wave
    {"ids", "matrix"}; raises if any id is missing (the reference's rewrite
    fails the search on a missing doc)."""
    ids = np.unique(np.asarray(ids, dtype=np.int64))
    if isinstance(source, str):
        import pyarrow.dataset as pads

        t = pads.dataset(source).to_table(
            columns=[id_col, vec_col],
            filter=pads.field(id_col).isin(ids.tolist()),
        )
    else:
        want = ids

        def filt(b: pa.Table) -> pa.Table:
            d = b.column(id_col).to_numpy(zero_copy_only=False)
            if len(want) == 0:
                return b.slice(0, 0)
            p = np.minimum(np.searchsorted(want, d), len(want) - 1)
            return b.filter(pa.array(want[p] == d))

        refs = (
            source.select_columns([id_col, vec_col])
            .map_batches(filt, batch_format="pyarrow")
            .to_arrow_refs()
        )
        t = pa.concat_tables([ray.get(r) for r in refs])
    got = t.column(id_col).to_numpy(zero_copy_only=False)
    missing = np.setdiff1d(ids, got)
    if len(missing):
        raise KeyError(
            f"indexed-vector ids not found in source table: {missing[:5].tolist()}"
        )
    order = np.argsort(got, kind="stable")
    return {
        "ids": got[order],
        "matrix": _to_matrix(t.column(vec_col))[order],
    }


def rescore_topn(
    scored,
    embeddings,
    query_ids_matrix: dict,
    *,
    n: int,
    k: int,
    metric: str = "cosine",
    n_parts: int = 32,
):
    """Generic query rescorer — the reference's ES ``rescore`` composition
    (QueryRescorerSuite.scala; FunctionScoreQuerySuite.scala:19-40): take
    ANY scored (query_id, neighbor_id, score) Dataset produced by an
    arbitrary upstream query, keep the top-``n`` per query by the UPSTREAM
    score (ties by neighbor_id asc), exact-re-score those candidates under
    ``metric`` against the stored vectors (HashingQuery.scala:23-38
    semantics: final decisions always use exact similarity) and return the
    per-query top-``k`` by the exact score.

    One coarse-keyed shuffle for the cut; the rescore reuses the shared
    gated-broadcast verify machinery of :func:`rescore_cosine_topk`.
    """
    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)

    def cut(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qi = t.column("query_id").to_numpy(zero_copy_only=False)
        ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sc = t.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((ni, -sc, qi))
        keep = order[_within_runs(qi[order]) < n]
        return pa.table(
            {
                "query_id": pa.array(qi[keep], pa.int64()),
                "neighbor_id": pa.array(ni[keep], pa.int64()),
            }
        )

    cand = (
        _coarse_query_key(scored.select_columns(["query_id", "neighbor_id", "score"]), n_parts)
        .groupby("part")
        .map_groups(lambda t: cut(t.drop_columns(["part"])), batch_format="pyarrow")
    )
    return rescore_cosine_topk(cand, embeddings, query_ids, qm, k, metric=metric)


def count_capped_hits(
    corpus_rows,
    qindex: "QueryHashIndex",
    q_freq_sorted: np.ndarray,
    *,
    num_partitions: int = 16,
):
    """Freq-capped match counting (Q1, the freq>1 case): per (query term,
    matching doc) the counter advances by min(freq_query, freq_doc) —
    ArrayHitCounter.java:34-41 via MatchHashesAndScoreQuery.java:63-79.

    ``corpus_rows`` is a Dataset of exploded (doc_id, hash, freq);
    ``q_freq_sorted`` is the per-entry query freq co-sorted with
    ``qindex.order``.  Returns (query_id, neighbor_id, hits).
    """
    from elastiknn_ray.stages.pairs import grouped_pair_count

    def f(t: pa.Table) -> pa.Table:
        h = t.column("hash").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        fd = t.column("freq").to_numpy(zero_copy_only=False)
        q_ix, rows, flat_pos = qindex.expand_full(h)
        contrib = np.minimum(q_freq_sorted[flat_pos], fd[rows])
        return pa.table(
            {
                "query_id": pa.array(qindex.query_ids[q_ix], pa.int64()),
                "neighbor_id": pa.array(d[rows], pa.int64()),
                "hits": pa.array(contrib.astype(np.int64), pa.int64()),
            }
        )

    hits = corpus_rows.map_batches(f, batch_format="pyarrow", batch_size=65536)
    return grouped_pair_count(
        hits,
        "query_id",
        "neighbor_id",
        count_col="hits",
        cnt_col="hits",
        num_partitions=num_partitions,
    )


def knn_perm_cosine(
    embeddings,
    query_ids_matrix: dict,
    k: int,
    *,
    perm=None,
    candidates: int = 100,
    metric: str = "cosine",
):
    """Permutation-LSH kNN: corpus and queries hash to (hash, freq)
    rows (PermutationLshModel.java:25-52), candidates are counted with the
    FREQ-CAPPED counter (min(freq_q, freq_d) per term — what makes
    PermutationLsh ranking correct), cut per query, exact re-scored.
    ``metric``: "cosine" or "l2" — the reference's two PermutationLsh
    query similarities (client-python utils.valid_metrics_algos).
    """
    from elastiknn_ray.config import PermutationLshConfig
    from elastiknn_ray.stages.float_lsh import PermutationLshStage, permutation_hashes

    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)
    perm = perm or PermutationLshConfig(k=min(32, qm.shape[1]), repeating=True)

    row_ix, enc, freq = permutation_hashes(qm, perm.k, perm.repeating)
    qindex = QueryHashIndex(
        query_ids, None, _flat=enc.view(np.uint64), _owner=row_ix
    )
    q_freq_sorted = freq[qindex.order]

    corpus_rows = embeddings.map_batches(
        PermutationLshStage(perm), batch_format="pyarrow", batch_size=4096
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                # view the signed encoding as uint64 so searchsorted agrees
                # with the query index's key order
                "hash": pa.array(
                    t.column("hash").to_numpy(zero_copy_only=False).view(np.uint64),
                    pa.uint64(),
                ),
                "freq": t.column("freq"),
            }
        ),
        batch_format="pyarrow",
    )
    counts = count_capped_hits(corpus_rows, qindex, q_freq_sorted)
    # per-query candidate cut on the shared vectorized merge (hits play the
    # n_bands role; counts are already global so the merge's sum is a no-op)
    cand = merge_cut_candidates(
        counts.map_batches(
            lambda t: pa.table(
                {
                    "query_id": t.column("query_id"),
                    "neighbor_id": t.column("neighbor_id"),
                    "n_bands": t.column("hits"),
                }
            ),
            batch_format="pyarrow",
        ),
        candidates,
    )
    return rescore_cosine_topk(cand, embeddings, query_ids, qm, k, metric=metric)


def knn_l2_lsh(
    embeddings,
    query_ids_matrix: dict,
    k: int,
    *,
    lsh=None,
    probes: int = 0,
    candidates: int = 100,
    num_partitions: int = 16,
    corpus_bands=None,
    bands_doc_contiguous: bool = True,
):
    """L2-LSH kNN with query-side MULTIPROBE expansion (L2LshModel.java:84-134
    after Qin et al. 2007 — the reference's published ann-benchmarks config
    shape, ann-benchmarks/config.yml:20-22): each query contributes its L
    unperturbed band hashes plus up to L*probes perturbed ones; candidates
    are counted per band collision, cut per query, exact-L2 re-scored
    (score = 1/(1+dist))."""
    from elastiknn_ray.config import L2LshConfig
    from elastiknn_ray.models.params import derive_l2
    from elastiknn_ray.stages.float_lsh import l2_bands_fn, l2_probe_hashes_many

    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)
    lsh = lsh or L2LshConfig(dims=qm.shape[1], L=32, k=4, w=4, seed=0)
    if lsh.dims != qm.shape[1]:
        raise ValueError(
            f"query dims {qm.shape[1]} != mapping dims {lsh.dims} "
            "(ElastiknnQueryBuilder.scala:38-92 compatibility check)"
        )
    if isinstance(corpus_bands, BandIndex):
        if corpus_bands.metric != "l2":
            raise ValueError(
                f"index metric {corpus_bands.metric!r} != query metric 'l2' "
                "(ElastiknnQueryBuilder.scala:38-92 compatibility check)"
            )
        lsh = corpus_bands.lsh
    p = derive_l2(lsh)
    a, b = p.A.astype(np.float64), p.B.astype(np.float64)

    if probes == 0:
        # no-probe wave: one vectorized matmul+floor+FNV pass — identical
        # hashes to the per-query heap path's first L entries
        from elastiknn_ray.stages.float_lsh import l2_band_hashes

        qh = l2_band_hashes(qm, a, b, float(lsh.w), lsh.L, lsh.k)
        qindex = QueryHashIndex(query_ids, qh)
    else:
        # query-side probe expansion (driver: one wave-wide projection
        # matmul + per-query integer heap, vectorized FNV encode at the end)
        offsets, values = l2_probe_hashes_many(
            qm, a, b, float(lsh.w), lsh.L, lsh.k, probes
        )
        qindex = QueryHashIndex.from_ragged(query_ids, offsets, values)

    if isinstance(corpus_bands, BandIndex):
        return _knn_lsh_indexed(corpus_bands, query_ids, qm, qindex, k, candidates)

    bands = corpus_bands  # fit-once/query-many injection (index-once model)
    if bands is None:
        bands = embeddings.map_batches(
            l2_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow",
            batch_size=4096,
        )
    # one-shuffle count/cut (shared LSH read path; seeks when the injected
    # band table is hash-sorted, scans otherwise)
    cand = merge_cut_candidates(
        count_cut_partials_auto(
            bands, qindex, candidates, partial_cut=bands_doc_contiguous
        ),
        candidates,
    )
    return rescore_cosine_topk(cand, embeddings, query_ids, qm, k, metric="l2")


# ------------------------------------------------------- persistent ANN index

def write_cosine_band_index(
    embeddings, lsh, path: str, *, num_buckets: int = 256
) -> None:
    """Persist a SEEKABLE band index: postings bucketed by
    ``band_hash % num_buckets`` as hive-partitioned Parquet (never one giant
    file), plus the stored vectors and a small JSON meta.  A query wave then
    reads ONLY the buckets its own hashes map to — the on-disk analogue of
    Lucene's term seek (MatchHashesAndScoreQuery.java:52-85), and the same
    pruning a 100 TB deployment gets from partition_cols at the object
    store."""
    import json
    import os

    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn

    emb = embeddings.select_columns(["vec_id", "embedding"])

    def bucketed(t: pa.Table) -> pa.Table:
        out = cosine_bands_fn(t, lsh)
        return out.append_column(
            "bucket",
            pa.array(
                out.column("band_hash").to_numpy(zero_copy_only=False)
                % np.uint64(num_buckets),
                pa.int32(),
            ),
        )

    emb.map_batches(bucketed, batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(path, "bands"), partition_cols=["bucket"]
    )
    emb.write_parquet(os.path.join(path, "vectors"))
    meta = {
        "num_buckets": num_buckets,
        "lsh": {"dims": lsh.dims, "L": lsh.L, "k": lsh.k, "seed": lsh.seed},
    }
    with open(os.path.join(path, "META.json"), "w") as f:
        json.dump(meta, f)


def knn_lsh_cosine_seek(
    path: str, query_ids_matrix: dict, k: int, *, candidates: int = 100
):
    """Query a written band index reading ONLY matching buckets: hash the
    query wave, map hashes to buckets, read just those partition dirs, then
    run the standard read path (countHits → cut → exact re-score) over the
    pruned postings stream."""
    import json
    import os

    import ray.data as rd

    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.models.params import derive_hyperplanes
    from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes

    with open(os.path.join(path, "META.json")) as f:
        meta = json.load(f)
    lsh = CosineLshConfig(**meta["lsh"])
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)
    planes = derive_hyperplanes(lsh).planes.astype(np.float64)
    qh = hyperplane_band_hashes(qm, planes, lsh.L, lsh.k)
    needed = np.unique(qh.reshape(-1) % np.uint64(meta["num_buckets"]))
    files = []
    for b in needed.tolist():
        d = os.path.join(path, "bands", f"bucket={b}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not files:
        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    from elastiknn_ray.stages.index_maint import drop_tombstoned, load_tombstones

    dead = load_tombstones(path)
    bands = drop_tombstoned(
        rd.read_parquet(files, columns=["doc_id", "band_hash"]), dead, "doc_id"
    )
    vectors = drop_tombstoned(
        rd.read_parquet(
            os.path.join(path, "vectors"), columns=["vec_id", "embedding"]
        ),
        dead,
        "vec_id",
    )
    # bucket-partitioned on-disk postings scatter a doc's L rows across
    # bucket dirs/blocks → NOT doc-contiguous: per-block partial cuts could
    # drop a doc whose collisions are spread 1-per-block even though its
    # summed count survives the global kthGreatest cut.  Count uncut per
    # block, cut only after the merge.
    return knn_lsh_cosine(
        vectors, query_ids_matrix, k, candidates=candidates, lsh=lsh,
        corpus_bands=bands, bands_doc_contiguous=False,
    )

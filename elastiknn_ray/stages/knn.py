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
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (N, dims) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
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
        ids = batch.column("vec_id").to_numpy()
        m = _to_matrix(batch.column("embedding"))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        scores = 1.0 + self.qn @ (m / norms).T  # (n_queries, n_batch)
        nq, nb = scores.shape
        k = min(self.k + (1 if self.exclude_self else 0), nb)
        # per-batch partial top-k per query
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        out_q, out_n, out_s = [], [], []
        for qi in range(nq):
            cand = part[qi]
            if self.exclude_self:
                cand = cand[ids[cand] != self.query_ids[qi]]
            out_q.append(np.full(len(cand), self.query_ids[qi], dtype=np.int64))
            out_n.append(ids[cand])
            out_s.append(scores[qi, cand])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
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

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "score"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_exact_metric(embeddings, query_ids_matrix: dict, k: int, metric: str):
    """Brute-force kNN under the reference's L1/L2 score conventions
    (ExactModel.java:26-33: score = 1/(1+dist)); same broadcast + partial
    top-k shape as the cosine path.  ``metric`` in {"l1", "l2"}."""
    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = np.asarray(query_ids_matrix["matrix"], dtype=np.float64)

    def score_batch(batch: pa.Table) -> pa.Table:
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
            dist = np.abs(qm[:, None, :] - m[None, :, :]).sum(axis=2)
        else:
            raise ValueError(metric)
        scores = 1.0 / (1.0 + dist)
        nq, nb = scores.shape
        kk = min(k + 1, nb)
        part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        out_q, out_n, out_s = [], [], []
        for qi in range(nq):
            cand = part[qi]
            cand = cand[ids[cand] != query_ids[qi]]
            out_q.append(np.full(len(cand), query_ids[qi], dtype=np.int64))
            out_n.append(ids[cand])
            out_s.append(scores[qi, cand])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    partials = embeddings.map_batches(
        score_batch, batch_format="pyarrow", batch_size=4096
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "score"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


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

    def expand_indices(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Flat corpus values → (query_index, input_row) per collision, where
        query_index indexes ``query_ids`` and input_row indexes ``hashes``."""
        if len(self.flat_sorted) == 0 or len(hashes) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pos = np.minimum(
            np.searchsorted(self.flat_sorted, hashes), len(self.flat_sorted) - 1
        )
        hit = self.flat_sorted[pos] == hashes
        rows = np.flatnonzero(hit)
        hpos = pos[rows]
        counts = self.run_len_at[hpos]
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        within_starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=within_starts[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(within_starts, counts)
        owner_ix = np.repeat(hpos, counts) + within
        return self.owner_sorted[owner_ix], np.repeat(rows, counts)

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


def topk_per_query(scored, k: int, *, exclude_self: bool = True):
    """(query_id, neighbor_id, score) → (query_id, rank, neighbor_id, score)
    global per-query top-k with the deterministic (-score, neighbor_id)
    tie-break — the final merge every kNN path shares."""

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "score"]]

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def build_cosine_band_index(embeddings, lsh):
    """Materialized exploded (doc_id, band_hash) corpus index — the engine's
    analogue of the reference's Lucene hash postings (HashingQuery.index,
    HashingQuery.scala:88-99).  Build once, query many times."""
    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn

    return embeddings.map_batches(
        cosine_bands_fn, fn_kwargs={"lsh": lsh}, batch_format="pyarrow",
        batch_size=4096,
    ).materialize()


def knn_lsh_cosine(
    embeddings,
    query_ids_matrix: dict,
    k: int,
    *,
    candidates: int = 100,
    lsh=None,
    concurrency=(1, 8),
    corpus_bands=None,
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
    lsh = lsh or CosineLshConfig(dims=qm.shape[1], L=32, k=8, seed=0)
    from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes

    planes = derive_hyperplanes(lsh).planes.astype(np.float64)
    qh = hyperplane_band_hashes(qm, planes, lsh.L, lsh.k)  # (Q, L)
    qindex = QueryHashIndex(query_ids, qh)

    def count_hits(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy()
        bh = hyperplane_band_hashes(m, planes, lsh.L, lsh.k)  # (N, L)
        return qindex.expand(bh.reshape(-1), np.repeat(ids, lsh.L))

    def count_hits_index(batch: pa.Table) -> pa.Table:
        return qindex.expand(
            batch.column("band_hash").to_numpy(zero_copy_only=False),
            batch.column("doc_id").to_numpy(zero_copy_only=False),
        )

    from elastiknn_ray.stages.pairs import grouped_pair_count

    if corpus_bands is not None:
        hits = corpus_bands.map_batches(
            count_hits_index, batch_format="pyarrow", batch_size=65536
        )
    else:
        hits = embeddings.map_batches(count_hits, batch_format="pyarrow")
    counts = grouped_pair_count(
        hits, "query_id", "neighbor_id", count_col="n_bands", num_partitions=16
    )

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        # kthGreatest semantics: keep the `candidates` highest collision
        # counts, ties broken by neighbor_id for determinism
        return g.sort_values(
            ["n_bands", "neighbor_id"], ascending=[False, True]
        ).head(candidates)

    cand = counts.groupby("query_id").map_groups(cut, batch_format="pandas")
    cand = cand.materialize()

    # exact re-score of candidates only (Q3): candidate embedding blocks
    # stay in the object store; rescore actors read them zero-copy (same
    # shard-refs pattern as the verify stages)
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
    qnorms = np.linalg.norm(qm, axis=1, keepdims=True)
    qnorms[qnorms == 0] = 1.0
    qn = qm / qnorms
    q_ref = ray.put({"ids": query_ids, "qn": qn})

    class _Rescore:
        def __init__(self, shard_refs, q_ref):
            tables = ray.get(list(shard_refs))
            ids_parts, mats = [], []
            for t in tables:
                if t.num_rows == 0:
                    continue
                ids_parts.append(t.column("vec_id").to_numpy(zero_copy_only=False))
                mats.append(_to_matrix(t.column("embedding")))
            if ids_parts:
                hid = np.concatenate(ids_parts)
                hmat = np.vstack(mats)
                ho = np.argsort(hid, kind="stable")
                self.hid = hid[ho]
                norms = np.linalg.norm(hmat, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                self.hn = (hmat / norms)[ho]
            else:
                self.hid = np.empty(0, np.int64)
                self.hn = np.empty((0, 0))
            qd = ray.get(q_ref)
            self.qn = qd["qn"]
            qids = qd["ids"]
            self.q_sorted = np.sort(qids)
            self.q_perm = np.argsort(qids, kind="stable")

        def __call__(self, t: pa.Table) -> pa.Table:
            qi = t.column("query_id").to_numpy(zero_copy_only=False)
            ni = t.column("neighbor_id").to_numpy(zero_copy_only=False)
            vix = np.searchsorted(self.hid, ni)
            qix = self.q_perm[np.searchsorted(self.q_sorted, qi)]
            score = 1.0 + np.einsum("ij,ij->i", self.qn[qix], self.hn[vix])
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

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "score"]]

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")

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

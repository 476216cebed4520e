"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the partition-based scale path for similarity search (complements
the LSH-bucketed path in cosine_lsh.py).

Classic IVF-Flat (public knowledge, e.g. Jégou et al. 2011):

1. **Train**: k-means centroids on a (small, seeded) sample — driver-side
   numpy Lloyd iterations on the broadcast-small side.
2. **Assign**: one matmul per corpus batch → ``cell`` column; the cell id is
   the partitioning key a real deployment writes Parquet partitions by.
3. **Search**: a query probes its ``nprobe`` nearest cells; only docs in
   probed cells are scored (exact cosine), then global top-k.

The corpus scan is ONE streaming map_batches with the centroid matrix and
query matrix broadcast via the task closure; no shuffle.  At 10^12-doc scale
step 2's output is written partitioned-by-cell so step 3 reads only probed
partitions (documented partitioning assumption).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.stages.knn import (
    _to_matrix,
    _within_runs,
    drop_null_vectors,
    topk_per_query,
)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(
    sample: np.ndarray, n_cells: int, *, iters: int = 10, seed: int = 0
) -> np.ndarray:
    """Spherical k-means (cosine IVF) on a sample: seeded init, Lloyd
    iterations, L2-normalized centroids.  Deterministic."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    n_cells = min(n_cells, n)
    cents = x[rng.choice(n, n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def assign_cells(embeddings, centroids: np.ndarray):
    """(vec_id, embedding) → + cell:int32 column (one matmul per batch).
    At scale, write_parquet(partition_cols=['cell']) on this output."""
    cents = np.ascontiguousarray(centroids)

    def f(batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        m = _normalize(_to_matrix(batch.column("embedding")))
        cell = (m @ cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cell, pa.int32()))

    return embeddings.map_batches(f, batch_format="pyarrow")


def knn_ivf_cosine(
    embeddings,
    query_ids_matrix: dict,
    k: int,
    *,
    n_cells: int = 64,
    nprobe: int = 8,
    train_sample: int = 4096,
    seed: int = 0,
):
    """IVF-Flat cosine kNN: train on a seeded sample, score each query only
    against docs in its ``nprobe`` nearest cells, reference 1+cos scores,
    (score desc, neighbor_id) tie-break.

    Returns (query_id, rank, neighbor_id, score).
    """
    query_ids = np.asarray(query_ids_matrix["ids"], dtype=np.int64)
    qm = _normalize(np.asarray(query_ids_matrix["matrix"], dtype=np.float64))

    # train: seeded driver-side sample (small side; broadcast from closure)
    sample_t = drop_null_vectors(  # missing-vector docs don't train
        embeddings.select_columns(["embedding"]).take_batch(
            train_sample, batch_format="pyarrow"
        )
    )
    sample = _to_matrix(sample_t.column("embedding"))
    cents = train_centroids(sample, n_cells, seed=seed)

    # per query: the nprobe nearest cells, as a (Q, n_cells) boolean lookup
    # indexed by cell id — probe membership is one fancy-index per batch
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed_lut = np.zeros((len(query_ids), len(cents)), dtype=bool)
    probed_lut[np.arange(len(query_ids))[:, None], probe] = True

    def scan(batch: pa.Table) -> pa.Table:
        batch = drop_null_vectors(batch)
        m = _normalize(_to_matrix(batch.column("embedding")))
        ids = batch.column("vec_id").to_numpy()
        cell = (m @ cents.T).argmax(axis=1)
        mask = probed_lut[:, cell]  # (Q, B) — mask decides BEFORE scoring
        q_ix, d_ix = np.nonzero(mask)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if len(q_ix) == 0:
            return empty
        # one matmul for the whole batch (masked-matmul + lexsort-cut, the
        # SparseSetTopK pattern) — no per-query Python loop
        scores = 1.0 + qm @ m.T  # (Q, B)
        sc = scores[q_ix, d_ix]
        neigh = ids[d_ix]
        # partial per-query top-(k+1) with the DETERMINISTIC
        # (score desc, neighbor_id asc) tie-break (+1 covers the self row
        # removed at the final merge)
        order = np.lexsort((neigh, -sc, q_ix))
        within = _within_runs(q_ix[order])
        keep = order[within < k + 1]
        return pa.table(
            {
                "query_id": pa.array(query_ids[q_ix[keep]], pa.int64()),
                "neighbor_id": pa.array(neigh[keep], pa.int64()),
                "score": pa.array(sc[keep], pa.float64()),
            }
        )

    partials = embeddings.map_batches(scan, batch_format="pyarrow", batch_size=4096)
    return topk_per_query(partials, k, exclude_self=True)


def write_ivf_index(
    embeddings, path: str, *, n_cells: int = 64, train_sample: int = 4096,
    seed: int = 0,
) -> None:
    """Persist an IVF index: embeddings hive-partitioned by cell (one dir
    per cell, never one giant file) + the centroid matrix.  A query wave
    reads ONLY its probed cells' partitions — the documented partitioning
    assumption of the IVF scale path, made concrete."""
    import json
    import os

    sample_t = drop_null_vectors(  # missing-vector docs don't train
        embeddings.select_columns(["embedding"]).take_batch(
            train_sample, batch_format="pyarrow"
        )
    )
    sample = _to_matrix(sample_t.column("embedding"))
    cents = train_centroids(sample, n_cells, seed=seed)
    assign_cells(embeddings, cents).write_parquet(
        os.path.join(path, "cells"), partition_cols=["cell"]
    )
    with open(os.path.join(path, "META.json"), "w") as f:
        json.dump({"centroids": cents.tolist()}, f)


def knn_ivf_cosine_seek(
    path: str, query_ids_matrix: dict, k: int, *, nprobe: int = 8
):
    """Query a written IVF index reading only probed cell partitions, then
    brute-force exact cosine over that pruned sub-corpus (IVF-Flat search
    with real partition pruning)."""
    import json
    import os

    import ray.data as rd

    from elastiknn_ray.stages.knn import knn_exact

    with open(os.path.join(path, "META.json")) as f:
        cents = np.array(json.load(f)["centroids"], dtype=np.float64)
    qm = _normalize(np.asarray(query_ids_matrix["matrix"], dtype=np.float64))
    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    needed = np.unique(probe.reshape(-1))
    files = []
    for c in needed.tolist():
        d = os.path.join(path, "cells", f"cell={c}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not files:
        import pyarrow as _pa

        return rd.from_arrow(
            _pa.table(
                {
                    "query_id": _pa.array([], _pa.int64()),
                    "rank": _pa.array([], _pa.int64()),
                    "neighbor_id": _pa.array([], _pa.int64()),
                    "score": _pa.array([], _pa.float64()),
                }
            )
        )
    from elastiknn_ray.stages.index_maint import drop_tombstoned, load_tombstones

    sub = drop_tombstoned(
        rd.read_parquet(files, columns=["vec_id", "embedding"]),
        load_tombstones(path),
        "vec_id",
    )
    return knn_exact(sub, query_ids_matrix, k)

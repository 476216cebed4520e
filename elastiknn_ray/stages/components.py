"""Distributed union-find over verified duplicate pairs (SURVEY.md §2.5 N4).

Connected components as an iterative Dataset groupby-aggregate fixpoint —
the alternating large-star / small-star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC 2014), which converges
in O(log n) rounds and needs only per-node neighbor groups (no joins):

- large-star: for every node u, connect each strictly-larger neighbor to
  m = min(Γ(u) ∪ {u}).
- small-star: direct edges large→small; for every node u, connect u and all
  its (smaller) neighbors to m = min(Γ(u) ∪ {u}).

Each operation is ``map_batches`` (edge re-direction) + ``groupby(u)`` +
per-group vectorized emission.  The edge set is re-materialized per round
(it is orders of magnitude smaller than the corpus — only verified dup
pairs); convergence is detected by an order-insensitive checksum aggregate,
never by collecting edges to the driver.

Output: labels (doc_id, cluster_id) with cluster_id = min doc_id of the
component — the determinism contract of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_U64 = np.uint64


def _bidirect(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy()
    v = batch.column("v").to_numpy()
    return pa.table(
        {
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, u]), pa.int64()),
        }
    )


def _direct_down(batch: pa.Table) -> pa.Table:
    """Point edges large→small, dropping self loops."""
    u = batch.column("u").to_numpy()
    v = batch.column("v").to_numpy()
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    return pa.table({"u": pa.array(hi[keep], pa.int64()), "v": pa.array(lo[keep], pa.int64())})


def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nbrs = np.unique(g["v"].to_numpy())
    m = min(u, int(nbrs[0]))
    bigger = nbrs[nbrs > u]
    return pd.DataFrame({"u": bigger, "v": np.full(len(bigger), m, dtype=np.int64)})


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nbrs = np.unique(g["v"].to_numpy())  # all < u by construction
    m = int(nbrs[0])
    out = np.append(nbrs[1:], u)  # everything except the min links to the min
    return pd.DataFrame({"u": out, "v": np.full(len(out), m, dtype=np.int64)})


def _checksum_batch(batch: pa.Table) -> pa.Table:
    """One row per batch: (n, xor-ish checksum of the edge multiset)."""
    u = batch.column("u").to_numpy().astype(np.int64).view(_U64)
    v = batch.column("v").to_numpy().astype(np.int64).view(_U64)
    x = u * _U64(0x9E3779B97F4A7C15) + v
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    return pa.table(
        {
            "n": pa.array([len(u)], pa.int64()),
            "chk": pa.array([int(x.sum(dtype=_U64))], pa.uint64()),
        }
    )


def _edge_checksum(edges) -> tuple[int, int]:
    t = edges.map_batches(_checksum_batch, batch_format="pyarrow")
    df = t.to_pandas()
    if df.empty:
        return 0, 0
    return int(df["n"].sum()), int(np.array(df["chk"], dtype=np.uint64).sum(dtype=np.uint64))


def connected_components(edges, *, max_rounds: int = 50):
    """edges(u, v) → labels(doc_id, cluster_id=min of component).

    The label table covers every node that appears in at least one edge;
    isolated nodes are absent (callers union them back as singletons).
    """
    import ray.data as rd

    edges = edges.map_batches(_direct_down, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )

    prev = (-1, -1)
    for _ in range(max_rounds):
        edges = (
            edges.map_batches(_bidirect, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        edges = (
            edges.map_batches(_direct_down, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pandas")
            .map_batches(_direct_down, batch_format="pyarrow")
            .materialize()
        )
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("connected_components did not converge")

    # Fixpoint edges are (member, root) stars; add (root, root) self-labels.
    def to_labels(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        roots = np.unique(v)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([u, roots]), pa.int64()),
                "cluster_id": pa.array(np.concatenate([v, roots]), pa.int64()),
            }
        )

    labels = edges.map_batches(to_labels, batch_format="pyarrow")
    # roots may repeat across batches — one final tiny dedup
    return labels.groupby("doc_id").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

"""Distributed union-find over verified duplicate pairs (SURVEY.md §2.5 N4).

Connected components as an iterative Dataset groupby-aggregate fixpoint —
the alternating large-star / small-star algorithm of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC 2014), which converges
in O(log n) rounds and needs only per-node neighbor groups (no joins):

- large-star: for every node u, connect each strictly-larger neighbor to
  m = min(Γ(u) ∪ {u}).
- small-star: direct edges large→small; for every node u, connect u and all
  its (smaller) neighbors to m = min(Γ(u) ∪ {u}).

Both stars are realized as ONE vectorized kernel call per hash partition:
edges are grouped on the coarse key ``u % P`` (all of a node's edges land in
one partition), and the per-node neighborhood scan inside a partition is a
lexsort + run-length sweep — no per-node Python calls.  The edge set is
re-materialized per round (it is orders of magnitude smaller than the corpus
— only verified dup pairs); convergence is detected by an order-insensitive
checksum aggregate, never by collecting edges to the driver.

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


def _sorted_runs(u: np.ndarray, v: np.ndarray):
    """Dedup + sort edges by (u, v); return (u, v, starts, ends) where each
    [start, end) slice is one node's ascending neighbor list."""
    order = np.lexsort((v, u))
    u = u[order]
    v = v[order]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    u = u[keep]
    v = v[keep]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], len(u)]
    return u, v, starts, ends


def _large_star_partition(t: pa.Table) -> pa.Table:
    """Vectorized large-star over one partition: emit (b, m) for every
    neighbor b > u, where m = min(Γ(u) ∪ {u})."""
    u, v, starts, ends = _sorted_runs(
        t.column("u").to_numpy(zero_copy_only=False),
        t.column("v").to_numpy(zero_copy_only=False),
    )
    if len(u) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    node = u[starts]
    m = np.minimum(node, v[starts])  # v sorted asc within run -> first is min
    run_ix = np.repeat(np.arange(len(starts)), ends - starts)
    bigger = v > u  # neighbor strictly larger than its node
    return pa.table(
        {
            "u": pa.array(v[bigger], pa.int64()),
            "v": pa.array(m[run_ix[bigger]], pa.int64()),
        }
    )


def _small_star_partition(t: pa.Table) -> pa.Table:
    """Vectorized small-star over one partition of large→small edges: for
    each node u (all neighbors < u), link u and every non-min neighbor to
    the min neighbor."""
    u, v, starts, ends = _sorted_runs(
        t.column("u").to_numpy(zero_copy_only=False),
        t.column("v").to_numpy(zero_copy_only=False),
    )
    if len(u) == 0:
        return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    node = u[starts]
    m = v[starts]  # min neighbor per run
    run_ix = np.repeat(np.arange(len(starts)), ends - starts)
    not_min = np.ones(len(u), dtype=bool)
    not_min[starts] = False  # drop each run's min neighbor
    out_u = np.concatenate([v[not_min], node])
    out_v = np.concatenate([m[run_ix[not_min]], m])
    return pa.table({"u": pa.array(out_u, pa.int64()), "v": pa.array(out_v, pa.int64())})


#: coarse shuffle fan-out for the star rounds; all edges of a node share a
#: partition, each partition is one vectorized kernel call
_CC_PARTITIONS = 32


def _with_part(ds):
    return ds.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                t.column("u").to_numpy(zero_copy_only=False) % _CC_PARTITIONS,
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
    )


def _star_round(ds, kernel):
    return (
        _with_part(ds)
        .groupby("part")
        .map_groups(
            lambda t, k=kernel: k(t.drop_columns(["part"])), batch_format="pyarrow"
        )
    )


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


#: Edge-count gate for the driver-side fast path: a few million (u, v) int64
#: pairs collect in well under a second, and union-find with path halving is
#: near-linear — far cheaper than O(log n) distributed rounds each paying
#: fixed scheduler latency.  Above the gate, the star-contraction fixpoint
#: runs fully distributed.
SMALL_EDGE_LIMIT = 2_000_000


def _driver_union_find(edges) -> "pa.Table":
    """Collect the (small) edge list and label components fully vectorized:
    min-label propagation over the edge arrays + pointer jumping
    (labels[labels]) per round — converges in ~O(log n) rounds, each one a
    handful of C-speed array ops (no Python per-edge loop).  Labels are
    node INDICES into the sorted-unique node array, so index minima equal
    doc-id minima and the fixpoint labels every node with its component's
    min doc_id."""
    us, vs = [], []
    for b in edges.iter_batches(batch_format="pyarrow"):
        us.append(b.column("u").to_numpy(zero_copy_only=False))
        vs.append(b.column("v").to_numpy(zero_copy_only=False))
    u = np.concatenate(us)
    v = np.concatenate(vs)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u) :]
    # pre-sort each endpoint side ONCE; per round the per-node min over
    # incident edges is then a gather + minimum.reduceat (no ufunc.at)
    ends = np.concatenate([ui, vi])
    other = np.concatenate([vi, ui])
    order = np.argsort(ends, kind="stable")
    ends_s, other_s = ends[order], other[order]
    run_starts = np.flatnonzero(np.r_[True, ends_s[1:] != ends_s[:-1]])
    run_nodes = ends_s[run_starts]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = labels
        m = np.minimum.reduceat(labels[other_s], run_starts)
        labels = labels.copy()
        labels[run_nodes] = np.minimum(labels[run_nodes], m)
        labels = labels[labels]  # pointer jumping
        labels = labels[labels]
        if np.array_equal(before, labels):
            break
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "cluster_id": pa.array(nodes[labels], pa.int64()),
        }
    )


def connected_components(edges, *, max_rounds: int = 50):
    """edges(u, v) → labels(doc_id, cluster_id=min of component).

    The label table covers every node that appears in at least one edge;
    isolated nodes are absent (callers union them back as singletons).

    Physical plan by edge count: <= SMALL_EDGE_LIMIT collects the edge list
    once and labels on the driver; larger graphs run the distributed
    star-contraction fixpoint below.
    """
    import ray.data as rd

    edges = edges.map_batches(_direct_down, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )
    if n_edges <= SMALL_EDGE_LIMIT:
        return rd.from_arrow(_driver_union_find(edges))

    prev = (-1, -1)
    for _ in range(max_rounds):
        edges = _star_round(
            edges.map_batches(_bidirect, batch_format="pyarrow"),
            _large_star_partition,
        )
        edges = _star_round(
            edges.map_batches(_direct_down, batch_format="pyarrow"),
            _small_star_partition,
        ).map_batches(_direct_down, batch_format="pyarrow").materialize()
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
    # roots may repeat across batches; duplicates agree on cluster_id, so a
    # vectorized min-aggregate dedups them (no per-group Python)
    from ray.data.aggregate import Min

    return (
        labels.groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("cluster_id"),
                "cluster_id",
                t.column("cluster_id").cast(pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )

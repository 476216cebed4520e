"""Union-find fixpoint (N4) vs a driver-side union-find oracle."""

import numpy as np
import pytest


def _oracle_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 20), (1, 200, 150), (2, 500, 700)])
def test_connected_components_vs_oracle(ray_session, seed, n_nodes, n_edges):
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.components import connected_components

    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    edges = rd.from_arrow(
        pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
    ).repartition(4)
    labels = connected_components(edges).to_pandas()
    got = dict(zip(labels["doc_id"], labels["cluster_id"]))

    expect = _oracle_components([(int(a), int(b)) for a, b in zip(u, v) if a != b])
    # nodes only in self-loop edges are absent from our labels — fine
    for node, root in expect.items():
        assert got.get(node, node) == root, f"node {node}"
    # every label must be the component min
    for node, root in got.items():
        assert root <= node


def test_connected_components_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.components import connected_components

    edges = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert connected_components(edges).count() == 0


def test_connected_components_chain(ray_session):
    """A long path graph is the worst case for label propagation — star
    contraction must still converge in O(log n) rounds."""
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.components import connected_components

    n = 300
    edges = rd.from_arrow(
        pa.table(
            {
                "u": pa.array(list(range(n - 1)), pa.int64()),
                "v": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    ).repartition(3)
    labels = connected_components(edges).to_pandas()
    assert set(labels["cluster_id"]) == {0}
    assert len(labels) == n


def test_connected_components_distributed_path(ray_session, monkeypatch):
    """Force the star-contraction fixpoint (edge gate = 0) and check it agrees
    with the driver-side union-find on a random graph."""
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    import elastiknn_ray.stages.components as cc

    rng = np.random.default_rng(5)
    u = rng.integers(0, 60, 80)
    v = rng.integers(0, 60, 80)
    keep = u != v
    edges = pa.table({"u": pa.array(u[keep], pa.int64()), "v": pa.array(v[keep], pa.int64())})

    fast = cc.connected_components(rd.from_arrow(edges)).to_pandas()
    monkeypatch.setattr(cc, "SMALL_EDGE_LIMIT", 0)
    dist = cc.connected_components(rd.from_arrow(edges)).to_pandas()

    fast = fast.sort_values("doc_id").reset_index(drop=True)
    dist = dist.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, dist)

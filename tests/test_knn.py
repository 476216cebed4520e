"""kNN path tests: LSH read path (countHits → cut → exact re-score) recall
vs the brute-force exact path — RecallSuite-style pinned expectation."""

import numpy as np
import pyarrow as pa


def _emb_ds(n=400, dims=32, seed=4):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dims)).astype(np.float32)
    return (
        rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                    "embedding": pa.array(list(m), pa.list_(pa.float32())),
                }
            )
        ).materialize(),
        m,
    )


def test_knn_lsh_recall_vs_exact(ray_session):
    from elastiknn_ray.stages.knn import knn_exact, knn_lsh_cosine

    emb, m = _emb_ds()
    q = {"ids": np.arange(10, dtype=np.int64), "matrix": m[:10].astype(np.float64)}
    exact = knn_exact(emb, q, k=10).to_pandas()
    approx = knn_lsh_cosine(emb, q, k=10, candidates=100).to_pandas()

    recalls = []
    for qid in range(10):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    mean_recall = float(np.mean(recalls))
    # RecallSuite-style pinned expectation.  Random Gaussian corpora have
    # weak nearest neighbors (cos ~ 0.4-0.6), where hyperplane LSH recall is
    # intrinsically moderate — the reference pins CosineLsh(400,1) at 0.46
    # (RecallSuite.scala:117-127); L=32,k=8 with candidates=100/400 lands
    # comfortably above 0.55.
    assert mean_recall >= 0.55, recalls


def test_knn_lsh_deterministic(ray_session):
    from elastiknn_ray.stages.knn import knn_lsh_cosine

    emb, m = _emb_ds()
    q = {"ids": np.arange(5, dtype=np.int64), "matrix": m[:5].astype(np.float64)}
    a = knn_lsh_cosine(emb, q, k=5).to_pandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    b = knn_lsh_cosine(emb, q, k=5).to_pandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_knn_ivf_recall_vs_exact(ray_session):
    """IVF-Flat with nprobe=8 of 16 cells on clustered data recovers most
    exact neighbors; deterministic across runs."""
    import pandas as pd

    from elastiknn_ray.stages.ivf import knn_ivf_cosine
    from elastiknn_ray.stages.knn import knn_exact

    # clustered corpus (IVF's operating regime)
    rng = np.random.default_rng(6)
    centers = rng.normal(size=(16, 24))
    m = np.vstack([c + 0.15 * rng.normal(size=(25, 24)) for c in centers])
    import pyarrow as pa
    import ray.data as rd

    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m), dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m.astype(np.float32)), pa.list_(pa.float32())),
            }
        )
    ).materialize()
    q = {"ids": np.arange(10, dtype=np.int64), "matrix": m[:10]}
    exact = knn_exact(emb, q, k=10).to_pandas()
    ivf = knn_ivf_cosine(emb, q, k=10, n_cells=16, nprobe=8, seed=0).to_pandas()

    recalls = []
    for qid in range(10):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert float(np.mean(recalls)) >= 0.9, recalls

    ivf2 = knn_ivf_cosine(emb, q, k=10, n_cells=16, nprobe=8, seed=0).to_pandas()
    pd.testing.assert_frame_equal(
        ivf.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ivf2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_assign_cells(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.ivf import assign_cells, train_centroids

    rng = np.random.default_rng(7)
    m = rng.normal(size=(200, 8)).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(200, dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    )
    cents = train_centroids(m.astype(np.float64), 8, seed=0)
    out = assign_cells(emb, cents).to_pandas()
    assert out["cell"].between(0, 7).all()
    assert out["cell"].nunique() > 1

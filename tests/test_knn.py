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

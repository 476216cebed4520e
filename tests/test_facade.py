"""fit/kneighbors facade (client-python/elastiknn/models.py:36-82 parity):
every (algorithm, metric) pair in valid_metrics_algos runs through ONE
class, exact paths agree with brute-force numpy, LSH paths reach high
recall at generous operating points, invalid combos fail at construction."""

import numpy as np
import pytest

from elastiknn_ray.models.facade import ElastiknnModel, dealias_metric

RNG = np.random.default_rng(42)
N, DIMS, Q, K = 240, 32, 8, 5


@pytest.fixture(scope="module")
def dense_corpus():
    base = RNG.normal(size=(N, DIMS))
    # planted near-neighbors so approximate recall is meaningful
    queries = base[:Q] + 0.01 * RNG.normal(size=(Q, DIMS))
    return base, queries


@pytest.fixture(scope="module")
def sparse_corpus():
    dims = 128
    x = RNG.random((N, dims)) < 0.25
    q = x[:Q].copy()
    flip = RNG.integers(0, dims, size=(Q, 3))
    for i in range(Q):
        q[i, flip[i]] = ~q[i, flip[i]]
    return x, q


def _exact_truth(base, queries, metric):
    if metric == "cosine":
        bn = base / np.linalg.norm(base, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = 1.0 + qn @ bn.T
    elif metric == "l2":
        d = np.linalg.norm(queries[:, None, :] - base[None, :, :], axis=2)
        sims = 1.0 / (1.0 + d)
    elif metric == "l1":
        d = np.abs(queries[:, None, :] - base[None, :, :]).sum(axis=2)
        sims = 1.0 / (1.0 + d)
    else:
        raise ValueError(metric)
    return sims


def _recall(inds, truth_sims, k):
    hits = 0
    for i in range(truth_sims.shape[0]):
        top = set(np.argsort(-truth_sims[i])[:k])
        hits += len(top & set(inds[i][inds[i] >= 0]))
    return hits / (truth_sims.shape[0] * k)


@pytest.mark.parametrize("metric", ["cosine", "l2", "l1"])
def test_exact_dense_matches_bruteforce(ray_session, dense_corpus, metric):
    base, queries = dense_corpus
    m = ElastiknnModel("exact", metric).fit(base)
    inds, sims = m.kneighbors(queries, K, return_similarity=True)
    truth = _exact_truth(base, queries, metric)
    for i in range(Q):
        expect = np.argsort(-truth[i], kind="stable")[:K]
        np.testing.assert_array_equal(np.sort(inds[i]), np.sort(expect))
        # embeddings tables store float32 (ndarray_to_embeddings); scores
        # re-derive in float64 from the rounded values
        np.testing.assert_allclose(
            np.sort(sims[i])[::-1], np.sort(truth[i][expect])[::-1], rtol=1e-5
        )


@pytest.mark.parametrize(
    "metric,params",
    [
        ("cosine", {"L": 64, "k": 4}),
        ("l2", {"L": 64, "k": 2, "w": 8}),
    ],
)
def test_lsh_dense_recall(ray_session, dense_corpus, metric, params):
    base, queries = dense_corpus
    qp = {"candidates": 60}
    if metric == "l2":
        qp["probes"] = 3  # multiprobe closes the tail (Qin 2007)
    m = ElastiknnModel(
        "lsh", metric, mapping_params=params, query_params=qp
    ).fit(base)
    inds = m.kneighbors(queries, K)
    truth = _exact_truth(base, queries, metric)
    assert _recall(inds, truth, K) >= 0.9


def test_permutation_lsh_both_metrics(ray_session, dense_corpus):
    base, queries = dense_corpus
    for metric in ("cosine", "l2"):
        m = ElastiknnModel(
            "permutation_lsh",
            metric,
            mapping_params={"k": 16},
            query_params={"candidates": 80},
        ).fit(base)
        inds = m.kneighbors(queries, K)
        truth = _exact_truth(base, queries, metric)
        assert _recall(inds, truth, K) >= 0.7, metric


def test_exact_sparse_jaccard_hamming(ray_session, sparse_corpus):
    x, q = sparse_corpus
    for metric in ("jaccard", "hamming"):
        m = ElastiknnModel("exact", metric).fit(x)
        inds, sims = m.kneighbors(q, 3, return_similarity=True)
        # the perturbed source row must be the top hit (3 bit flips of ~32)
        assert (inds[:, 0] == np.arange(Q)).mean() >= 0.9, metric
        assert np.nanmax(sims) <= 1.0 + 1e-12


def test_lsh_sparse_jaccard_recall(ray_session, sparse_corpus):
    x, q = sparse_corpus
    m = ElastiknnModel(
        "lsh",
        "jaccard",
        mapping_params={"L": 96, "k": 1},
        query_params={"candidates": 60},
    ).fit(x)
    inds = m.kneighbors(q, 3)
    assert (inds[:, 0] == np.arange(Q)).mean() >= 0.75


def test_lsh_hamming_recall(ray_session, sparse_corpus):
    x, q = sparse_corpus
    m = ElastiknnModel(
        "lsh",
        "hamming",
        mapping_params={"L": 96, "k": 2},
        query_params={"candidates": 60},
    ).fit(x)
    inds = m.kneighbors(q, 3)
    assert (inds[:, 0] == np.arange(Q)).mean() >= 0.75


def test_invalid_combo_fails_at_construction():
    with pytest.raises(ValueError):
        ElastiknnModel("lsh", "l1")
    with pytest.raises(ValueError):
        ElastiknnModel("permutation_lsh", "jaccard")


def test_metric_dealiasing():
    assert dealias_metric("Angular") == "cosine"
    assert dealias_metric("euclidean") == "l2"
    m = ElastiknnModel("exact", "angular")
    assert m._metric == "cosine"

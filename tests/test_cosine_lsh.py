"""Cosine-LSH path tests: hyperplane kernel properties + LSH-vs-exact recall
(the JaccardLshSuite-style exact-vs-approximate agreement check of SURVEY.md
§5 applied to H3)."""

import numpy as np
import pyarrow as pa
import pytest

from elastiknn_ray.config import CosineLshConfig
from elastiknn_ray.models.params import derive_hyperplanes
from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes


def test_hyperplane_hash_invariant_to_magnitude():
    """CosineLshModelSuite property: hashes invariant to vector scaling."""
    cfg = CosineLshConfig(dims=16, L=8, k=4, seed=0)
    planes = derive_hyperplanes(cfg).planes.astype(np.float64)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(20, 16))
    h1 = hyperplane_band_hashes(v, planes, cfg.L, cfg.k)
    h2 = hyperplane_band_hashes(v * 7.5, planes, cfg.L, cfg.k)
    assert (h1 == h2).all()
    assert h1.shape == (20, 8)


def test_hyperplane_identical_vectors_collide_everywhere():
    cfg = CosineLshConfig(dims=16, L=8, k=4, seed=0)
    planes = derive_hyperplanes(cfg).planes.astype(np.float64)
    rng = np.random.default_rng(1)
    v = rng.normal(size=(1, 16))
    h = hyperplane_band_hashes(np.vstack([v, v * 2.0]), planes, cfg.L, cfg.k)
    assert (h[0] == h[1]).all()


def _clustered_embeddings(n_clusters=40, per=5, dims=32, noise=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dims))
    vecs, ids = [], []
    i = 0
    for c in centers:
        for _ in range(per):
            vecs.append(c + noise * rng.normal(size=dims))
            ids.append(i)
            i += 1
    return np.array(ids, dtype=np.int64), np.array(vecs)


def test_cosine_lsh_recall_vs_exact(ray_session):
    """Candidate pairs from hyperplane LSH + exact verify must recover >= 95%
    of the exact cos>=0.9 pairs at L=32, k=8 (and be a subset of them)."""
    import ray.data as rd

    from elastiknn_ray.stages.cosine_lsh import (
        CosineLshBandStage,
        cosine_dup_pairs_exact,
        verify_cosine_pairs,
    )
    from elastiknn_ray.stages.pairs import candidate_pairs

    ids, m = _clustered_embeddings()
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in m], pa.list_(pa.float32())
            ),
        }
    )
    emb = rd.from_arrow(tbl).materialize()

    exact = cosine_dup_pairs_exact(emb, 0.9).to_pandas()
    exact_set = set(zip(exact["vec_a"], exact["vec_b"]))
    assert len(exact_set) > 100  # sanity: clusters generate dup pairs

    bands = emb.map_batches(
        CosineLshBandStage,
        fn_constructor_kwargs={"lsh": CosineLshConfig(dims=32, L=32, k=8, seed=0)},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    cands = candidate_pairs(bands, cap=256)
    lsh = verify_cosine_pairs(cands, emb, 0.9, num_partitions=2).to_pandas()
    lsh_set = set(zip(lsh["vec_a"], lsh["vec_b"]))

    assert lsh_set <= exact_set  # exact verify -> no false positives
    recall = len(lsh_set & exact_set) / len(exact_set)
    assert recall >= 0.95, recall

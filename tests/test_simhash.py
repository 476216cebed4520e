"""SimHash/Hamming path tests (SURVEY.md §5 layers 1-2 applied to M6)."""

import numpy as np
import pyarrow as pa
import pytest

from elastiknn_ray.config import HammingLshConfig, SimHashDedupConfig
from elastiknn_ray.models.exact import hamming_similarity_packed
from elastiknn_ray.models.params import derive_bitsample
from elastiknn_ray.models.simhash import (
    bitsample_band_hashes,
    extract_bits,
    simhash_scalar,
    simhash_signatures,
)


def _ragged(rng, n, dims=None):
    lens = rng.integers(0, 40, n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = rng.integers(0, 2**63, offsets[-1], dtype=np.int64).astype(np.uint64)
    return offsets, values


def test_simhash_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    offsets, values = _ragged(rng, 50)
    for dims in (64, 128):
        sig = simhash_signatures(offsets, values, dims)
        for i in range(50):
            ref = simhash_scalar(values[offsets[i] : offsets[i + 1]], dims)
            assert (sig[i] == ref).all(), i


def test_simhash_empty_doc_is_zero():
    offsets = np.array([0, 0, 3], dtype=np.int64)
    values = np.array([1, 2, 3], dtype=np.uint64)
    sig = simhash_signatures(offsets, values, 64)
    assert sig[0, 0] == 0
    assert sig[1, 0] != 0


def test_simhash_near_sets_near_signatures():
    """Core SimHash property: heavily-overlapping sets → small Hamming
    distance; disjoint random sets → distance near dims/2."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 2**63, 300, dtype=np.int64).astype(np.uint64)
    mutated = base.copy()
    mutated[:15] = rng.integers(0, 2**63, 15, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 2**63, 300, dtype=np.int64).astype(np.uint64)
    offsets = np.array([0, 300, 600, 900], dtype=np.int64)
    sig = simhash_signatures(
        offsets, np.concatenate([base, mutated, other]), 64
    )
    near = hamming_similarity_packed(sig[0:1], sig[1:2], 64)[0]
    far = hamming_similarity_packed(sig[0:1], sig[2:3], 64)[0]
    assert near > 0.85
    assert far < 0.75


def test_bitsample_band_count_and_determinism():
    cfg = HammingLshConfig(dims=64, L=8, k=16, seed=0)
    params = derive_bitsample(cfg)
    assert params.positions.shape == (8, 16)
    rng = np.random.default_rng(2)
    sig = rng.integers(0, 2**63, (20, 1), dtype=np.int64).astype(np.uint64)
    h1 = bitsample_band_hashes(sig, params)
    h2 = bitsample_band_hashes(sig, derive_bitsample(cfg))
    assert h1.shape == (20, 8)
    assert (h1 == h2).all()


def test_bitsample_equal_sampled_bits_collide():
    """Two signatures equal on a table's sampled positions collide in that
    table; differing on a sampled position do not."""
    cfg = HammingLshConfig(dims=64, L=4, k=8, seed=0)
    params = derive_bitsample(cfg)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, (1, 1), dtype=np.int64).astype(np.uint64)
    for ix_l in range(4):
        pos = params.positions[ix_l]
        # flip one bit NOT sampled by table ix_l -> collide in table ix_l
        free = next(p for p in range(64) if p not in set(pos.tolist()))
        b = a.copy()
        b[0, 0] ^= np.uint64(1) << np.uint64(free)
        ha = bitsample_band_hashes(a, params)
        hb = bitsample_band_hashes(b, params)
        assert ha[0, ix_l] == hb[0, ix_l]
        # flip a sampled bit -> that table's hash changes
        c = a.copy()
        c[0, 0] ^= np.uint64(1) << np.uint64(int(pos[0]))
        hc = bitsample_band_hashes(c, params)
        assert ha[0, ix_l] != hc[0, ix_l]


def test_extract_bits_lanes():
    sig = np.array([[0b1011, 0b1]], dtype=np.uint64)  # lane 1 = bit 64
    bits = extract_bits(sig, np.array([0, 1, 2, 3, 64, 65]))
    assert bits.tolist() == [[1, 1, 0, 1, 1, 0]]


def test_simhash_pipeline_finds_clones(ray_session):
    """End-to-end Hamming path on the synthetic corpus: exact clones must be
    clustered together (clone signatures are identical -> collide in every
    band, survive tau)."""
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import simhash_near_dup_pipeline
    from elastiknn_ray.sources.synth import pages_table, role_of, base_target

    n, seed = 400, 7
    pages = rd.from_arrow(pages_table(n, seed))
    res = simhash_near_dup_pipeline(
        pages, SimHashDedupConfig(), num_partitions=4
    )
    clusters = res.clusters.to_pandas().set_index("doc_id")["cluster_id"]

    from elastiknn_ray.stages.hashing import doc_id_of_url
    from elastiknn_ray.sources.synth import url_of

    n_hosts = max(4, n // 50)
    clone_pairs = [
        (base_target(i, seed), i)
        for i in range(n)
        if role_of(i, seed) == "clone"
    ]
    assert clone_pairs
    for j, i in clone_pairs:
        a = doc_id_of_url(url_of(j, seed, n_hosts))
        b = doc_id_of_url(url_of(i, seed, n_hosts))
        assert a in clusters.index and b in clusters.index
        assert clusters[a] == clusters[b], (j, i)


def test_simhash_pipeline_deterministic(ray_session):
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import simhash_near_dup_pipeline
    from elastiknn_ray.sources.synth import pages_table

    outs = []
    for parts in (3, 9):
        pages = rd.from_arrow(pages_table(300, 11)).repartition(parts)
        res = simhash_near_dup_pipeline(
            pages, SimHashDedupConfig(), num_partitions=4
        )
        outs.append(
            res.pairs.to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
    import pandas as pd

    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_knn_hamming_lsh_recall_vs_exact(ray_session):
    """HammingLsh read path (bit-sampled bands -> cut -> packed-Hamming
    rescore) recovers the brute-force packed-Hamming top-k."""
    import numpy as np
    import ray.data as rd

    from elastiknn_ray.config import HammingLshConfig, ShingleConfig
    from elastiknn_ray.sources.synth import pages_table
    from elastiknn_ray.stages.hashing import SignatureStage, prepare_batch
    from elastiknn_ray.stages.simhash import (
        SimHashStage,
        gather_query_sigs,
        knn_exact_hamming_sig,
        knn_hamming_lsh,
    )

    dims = 256
    docs = rd.from_arrow(pages_table(300, 11)).map_batches(
        prepare_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "text"])
    sigs = docs.map_batches(
        SignatureStage(ShingleConfig(k=3)), batch_format="pyarrow"
    ).map_batches(SimHashStage(dims), batch_format="pyarrow").materialize()

    all_ids = np.sort(
        np.concatenate(
            [
                b.column("doc_id").to_numpy(zero_copy_only=False)
                for b in sigs.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    qs = gather_query_sigs(sigs, all_ids[:10])
    exact = knn_exact_hamming_sig(sigs, qs, k=5, dims=dims).to_pandas()
    lsh = knn_hamming_lsh(
        sigs, qs, k=5,
        lsh=HammingLshConfig(dims=dims, L=64, k=3, seed=0), candidates=100,
    ).to_pandas()
    e = {q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")}
    l = {q: set(g["neighbor_id"]) for q, g in lsh.groupby("query_id")}
    hits = sum(len(e[q] & l.get(q, set())) for q in e)
    total = sum(len(v) for v in e.values())
    assert total > 0
    assert hits / total >= 0.8, hits / total


def test_knn_hamming_lsh_sorted_corpus_bands_match(ray_session):
    """Injected hash-sorted band postings (fit/query split) route through the
    seek kernel and return exactly the recomputed-bands result."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from elastiknn_ray.config import HammingLshConfig, ShingleConfig
    from elastiknn_ray.sources.synth import pages_table
    from elastiknn_ray.stages.hashing import SignatureStage, prepare_batch
    from elastiknn_ray.stages.knn import sort_band_blocks
    from elastiknn_ray.stages.simhash import (
        SimHashStage,
        bitsample_bands_fn,
        gather_query_sigs,
        knn_hamming_lsh,
    )

    dims = 256
    docs = rd.from_arrow(pages_table(300, 11)).map_batches(
        prepare_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "text"])
    sigs = docs.map_batches(
        SignatureStage(ShingleConfig(k=3)), batch_format="pyarrow"
    ).map_batches(SimHashStage(dims), batch_format="pyarrow").materialize()
    all_ids = np.sort(
        np.concatenate(
            [
                b.column("doc_id").to_numpy(zero_copy_only=False)
                for b in sigs.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    qs = gather_query_sigs(sigs, all_ids[:8])
    cfg = HammingLshConfig(dims=dims, L=64, k=3, seed=0)
    bands = sort_band_blocks(
        sigs.map_batches(
            bitsample_bands_fn, fn_kwargs={"lsh": cfg}, batch_format="pyarrow"
        )
    ).materialize()
    a = knn_hamming_lsh(sigs, qs, k=5, lsh=cfg, candidates=100).to_pandas()
    b = knn_hamming_lsh(
        sigs, qs, k=5, lsh=cfg, candidates=100, corpus_bands=bands
    ).to_pandas()

    def canon(df):
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b))

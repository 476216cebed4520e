"""Sparse-set kNN (stages/sparse_knn.py): exact Jaccard/Hamming top-k vs a
brute-force scalar oracle, and LSH-path recall vs the exact path — the
engine's version of the reference's RecallSuite.scala:59-100 exact-vs-
approximate agreement checks."""

import numpy as np
import pytest


def _sigs_and_queries(n=300, seed=11, shingle_k=3, n_q=10):
    import ray.data as rd

    from elastiknn_ray.config import ShingleConfig
    from elastiknn_ray.sources.synth import pages_table
    from elastiknn_ray.stages.hashing import SignatureStage, prepare_batch
    from elastiknn_ray.stages.sparse_knn import gather_query_sets

    docs = rd.from_arrow(pages_table(n, seed)).map_batches(
        prepare_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "text"])
    sigs = docs.map_batches(
        SignatureStage(ShingleConfig(k=shingle_k)), batch_format="pyarrow"
    ).materialize()
    all_ids = np.sort(
        np.concatenate(
            [
                b.column("doc_id").to_numpy(zero_copy_only=False)
                for b in sigs.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    qids = all_ids[:n_q]
    return sigs, gather_query_sets(sigs, qids), qids


def _collect_sets(sigs):
    from elastiknn_ray.stages.hashing import decode_u64_lists

    sets = {}
    for b in sigs.iter_batches(batch_format="pyarrow"):
        off, vals = decode_u64_lists(b.column("shingles"))
        for i, d in enumerate(b.column("doc_id").to_pylist()):
            sets[int(d)] = set(vals[off[i] : off[i + 1]].tolist())
    return sets


def _scalar_topk(sets, qids, k, metric):
    out = {}
    for q in qids:
        qa = sets[q]
        scored = []
        for d, da in sets.items():
            if d == q:
                continue
            isec = len(qa & da)
            if isec == 0:
                continue
            if metric == "jaccard":
                s = isec / (len(qa) + len(da) - isec)
            else:
                s = 2.0 * isec - len(qa) - len(da)
            scored.append((-s, d))
        scored.sort()
        out[int(q)] = [d for _, d in scored[:k]]
    return out


@pytest.mark.parametrize("metric", ["jaccard", "hamming"])
def test_knn_exact_sparse_matches_scalar_oracle(ray_session, metric):
    from elastiknn_ray.stages.sparse_knn import knn_exact_sparse

    sigs, qs, qids = _sigs_and_queries()
    out = knn_exact_sparse(sigs, qs, k=5, metric=metric).to_pandas()
    expect = _scalar_topk(_collect_sets(sigs), qids, 5, metric)
    got = {
        int(q): g.sort_values("rank")["neighbor_id"].tolist()
        for q, g in out.groupby("query_id")
    }
    assert set(got) == {q for q, v in expect.items() if v}
    for q, neigh in got.items():
        assert neigh == expect[q][: len(neigh)], q


def test_knn_lsh_jaccard_recall_vs_exact(ray_session):
    from elastiknn_ray.config import JaccardLshConfig
    from elastiknn_ray.stages.sparse_knn import knn_exact_sparse, knn_lsh_jaccard

    sigs, qs, qids = _sigs_and_queries()
    exact = knn_exact_sparse(sigs, qs, k=5, metric="jaccard").to_pandas()
    lsh = knn_lsh_jaccard(
        sigs, qs, k=5, lsh=JaccardLshConfig(L=128, k=1, seed=0), candidates=100
    ).to_pandas()
    e = {q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")}
    l = {q: set(g["neighbor_id"]) for q, g in lsh.groupby("query_id")}
    hits = sum(len(e[q] & l.get(q, set())) for q in e)
    total = sum(len(v) for v in e.values())
    recall = hits / max(total, 1)
    assert recall >= 0.9, recall


def test_knn_lsh_jaccard_partition_invariant(ray_session):
    """One-shuffle read-path determinism pin: the merged/cut/re-scored top-k
    must be byte-identical no matter how the corpus blocks are split (the
    partial per-block cut is a superset of the global cut; the merge sums
    split partials)."""
    from elastiknn_ray.config import JaccardLshConfig
    from elastiknn_ray.stages.sparse_knn import knn_lsh_jaccard

    sigs, qs, qids = _sigs_and_queries()
    cfg = JaccardLshConfig(L=64, k=1, seed=0)
    outs = []
    for parts in (1, 7):
        out = knn_lsh_jaccard(
            sigs.repartition(parts), qs, k=5, lsh=cfg, candidates=50
        ).to_pandas()
        outs.append(
            out.sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_knn_lsh_jaccard_sorted_corpus_bands_match(ray_session):
    """Hash-sorted band postings injected as corpus_bands (fit/query split +
    seek kernel) return exactly the recomputed-bands result."""
    import pandas as pd

    from elastiknn_ray.config import JaccardLshConfig
    from elastiknn_ray.stages.hashing import minhash_bands_fn
    from elastiknn_ray.stages.knn import sort_band_blocks
    from elastiknn_ray.stages.sparse_knn import knn_lsh_jaccard

    sigs, qs, qids = _sigs_and_queries()
    cfg = JaccardLshConfig(L=64, k=1, seed=0)
    bands = sort_band_blocks(
        sigs.map_batches(
            minhash_bands_fn, fn_kwargs={"lsh": cfg}, batch_format="pyarrow"
        )
    ).materialize()
    a = knn_lsh_jaccard(sigs, qs, k=5, lsh=cfg, candidates=50).to_pandas()
    b = knn_lsh_jaccard(
        sigs, qs, k=5, lsh=cfg, candidates=50, corpus_bands=bands
    ).to_pandas()

    def canon(df):
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b))


def test_knn_lsh_jaccard_sparse_band_index_match(ray_session):
    """SparseBandIndex (postings + one-time shingle gather, in-merge exact
    rescore) returns exactly the streaming verify-stage result."""
    import pandas as pd

    from elastiknn_ray.config import JaccardLshConfig
    from elastiknn_ray.stages.sparse_knn import (
        build_jaccard_band_index,
        knn_lsh_jaccard,
    )

    sigs, qs, qids = _sigs_and_queries()
    cfg = JaccardLshConfig(L=64, k=1, seed=0)
    index = build_jaccard_band_index(sigs, cfg, num_blocks=4)
    a = knn_lsh_jaccard(sigs, qs, k=5, lsh=cfg, candidates=50).to_pandas()
    b = knn_lsh_jaccard(
        sigs, qs, k=5, candidates=50, corpus_bands=index
    ).to_pandas()

    def canon(df):
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(a), canon(b))

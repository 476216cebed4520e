"""Append/delete/compact maintenance for the persisted ANN indexes —
MixedIndexSearchDeleteSuite.scala semantics: search results after live
updates and deletes equal a fresh index built on the surviving corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _emb(n, dims, seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dims)).astype(np.float32)
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    ).materialize()
    return ds, m


def _slice(ds, lo, hi):
    def f(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids >= lo) & (ids < hi)))

    return ds.map_batches(f, batch_format="pyarrow").materialize()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_band_index_append_delete_compact(ray_session, tmp_path):
    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.stages.index_maint import (
        append_cosine_band_index,
        compact_cosine_band_index,
        delete_from_index,
        load_tombstones,
    )
    from elastiknn_ray.stages.knn import (
        knn_lsh_cosine_seek,
        write_cosine_band_index,
    )

    ds, m = _emb(300, 24, seed=11)
    lsh = CosineLshConfig(dims=24, L=8, k=6, seed=0)
    q = {"ids": np.arange(4, dtype=np.int64), "matrix": m[:4].astype(np.float64)}

    # fresh index over the full corpus = the oracle for the appended index
    full = str(tmp_path / "full")
    write_cosine_band_index(ds, lsh, full, num_buckets=32)
    want_full = _canon(knn_lsh_cosine_seek(full, q, k=5, candidates=60).to_pandas())

    # build on the first 200, append the next 100 -> identical results
    inc = str(tmp_path / "inc")
    write_cosine_band_index(_slice(ds, 0, 200), lsh, inc, num_buckets=32)
    append_cosine_band_index(_slice(ds, 200, 300), inc)
    got = _canon(knn_lsh_cosine_seek(inc, q, k=5, candidates=60).to_pandas())
    pd.testing.assert_frame_equal(got, want_full)

    # delete 50 docs -> equals a fresh index on the survivors
    dead = np.arange(25, 75, dtype=np.int64)
    delete_from_index(inc, dead)
    assert len(load_tombstones(inc)) == 50
    survivors = str(tmp_path / "surv")
    keep = ds.map_batches(
        lambda t: t.filter(
            pa.array(
                ~np.isin(t.column("vec_id").to_numpy(zero_copy_only=False), dead)
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    write_cosine_band_index(keep, lsh, survivors, num_buckets=32)
    want_del = _canon(
        knn_lsh_cosine_seek(survivors, q, k=5, candidates=60).to_pandas()
    )
    got_del = _canon(knn_lsh_cosine_seek(inc, q, k=5, candidates=60).to_pandas())
    pd.testing.assert_frame_equal(got_del, want_del)
    assert not set(got_del["neighbor_id"]) & set(dead.tolist())

    # compact (force-merge): tombstones cleared, results unchanged
    n = compact_cosine_band_index(inc)
    assert n == 50
    assert len(load_tombstones(inc)) == 0
    got_compact = _canon(knn_lsh_cosine_seek(inc, q, k=5, candidates=60).to_pandas())
    pd.testing.assert_frame_equal(got_compact, want_del)

    # idempotent no-op compact
    assert compact_cosine_band_index(inc) == 0


def test_ivf_index_append_delete_compact(ray_session, tmp_path):
    from elastiknn_ray.stages.index_maint import (
        append_ivf_index,
        compact_ivf_index,
        delete_from_index,
        load_tombstones,
    )
    from elastiknn_ray.stages.ivf import knn_ivf_cosine_seek, write_ivf_index

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16))
    m = np.vstack([c + 0.2 * rng.normal(size=(40, 16)) for c in centers]).astype(
        np.float32
    )
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m), dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    ).materialize()
    # queries from both the base range and the appended range so appended
    # docs actually compete for the top-k
    q_rows = np.array([0, 1, 2, 200, 201], dtype=np.int64)
    q = {
        "ids": np.arange(5, dtype=np.int64),
        "matrix": m[q_rows].astype(np.float64),
    }

    # Build on the first 200 (which fixes the trained centroids), then
    # append the rest; the oracle is the SAME index before deletion.
    path = str(tmp_path / "ivf")
    write_ivf_index(_slice(ds, 0, 200), path, n_cells=8, seed=0)
    append_ivf_index(_slice(ds, 200, len(m)), path)
    before = _canon(knn_ivf_cosine_seek(path, q, k=8, nprobe=3).to_pandas())
    # appended docs are reachable: vec_ids >= 200 appear among neighbors
    assert (before["neighbor_id"] >= 200).any()

    dead = np.arange(0, 30, dtype=np.int64)
    delete_from_index(path, dead)
    after = _canon(knn_ivf_cosine_seek(path, q, k=8, nprobe=3).to_pandas())
    assert not set(after["neighbor_id"]) & set(dead.tolist())
    # non-deleted neighbors keep their relative order (scores unchanged)
    for qid in range(5):
        b = [
            n
            for n in before[before["query_id"] == qid]["neighbor_id"]
            if n not in set(dead.tolist())
        ]
        a = list(after[after["query_id"] == qid]["neighbor_id"])
        assert a[: len(b)] == b[: len(a)] or a == b

    n = compact_ivf_index(path)
    assert n == 30 and len(load_tombstones(path)) == 0
    compacted = _canon(knn_ivf_cosine_seek(path, q, k=8, nprobe=3).to_pandas())
    pd.testing.assert_frame_equal(compacted, after)


def test_tombstone_gate(tmp_path):
    from elastiknn_ray.stages import index_maint as im

    p = str(tmp_path / "idx")
    im.delete_from_index(p, np.arange(10))
    old = im.MAX_TOMBSTONES
    im.MAX_TOMBSTONES = 5
    try:
        with pytest.raises(RuntimeError, match="compact"):
            im.load_tombstones(p)
    finally:
        im.MAX_TOMBSTONES = old
    assert len(im.load_tombstones(p)) == 10

"""Incremental maintenance for the persisted ANN indexes: append, delete,
compact.

The reference handles live updates and deletes through the Elasticsearch
segment model — new docs land in new segments, deletes are tombstones applied
at read, merges compact them away — with search correctness pinned by
MixedIndexSearchDeleteSuite.scala.  The Parquet analogues here:

- APPEND: hash/assign only the new docs with the index's stored config and
  write them as NEW files into the existing hive partitions (bucket=N /
  cell=N dirs).  Like a new Lucene segment, nothing existing is rewritten,
  and partition pruning keeps working because the partition key derivation
  is deterministic from META.
- DELETE: doc ids are appended to a tombstone table under ``tombstones/``.
  Readers subtract tombstones from the postings stream (the analogue of
  Lucene's live-docs bitset).  Deleting never rewrites data files.
- COMPACT: rewrites the data files without tombstoned docs and clears the
  tombstone table (the analogue of a force-merge).  Readers see identical
  results before and after — pinned in tests/test_index_maint.py.

Tombstones are read driver-side once per query wave (a doc-id array, tiny
relative to the index) and applied inside ``map_batches`` with a vectorized
``np.isin`` — at 100 TB the tombstone table for even 1% deletes of 10^12 docs
is ~80 GB, past which compaction is mandatory; ``load_tombstones`` raises
past a documented gate to force that conversation rather than silently
shipping a giant array to every task.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: refuse to broadcast more tombstones than this — compact instead.
MAX_TOMBSTONES = 50_000_000


# ------------------------------------------------------------- tombstones


def delete_from_index(path: str, doc_ids: np.ndarray) -> None:
    """Tombstone ``doc_ids`` in the index at ``path`` (band or IVF layout).
    Append-only and idempotent: duplicate deletes are harmless."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    d = os.path.join(path, "tombstones")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64())}),
        os.path.join(d, f"del-{uuid.uuid4().hex}.parquet"),
    )


def load_tombstones(path: str) -> np.ndarray:
    """All tombstoned doc ids at ``path`` (sorted unique int64; empty if
    none)."""
    d = os.path.join(path, "tombstones")
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = [
        pq.read_table(os.path.join(d, f), columns=["doc_id"])
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not parts:
        return np.empty(0, dtype=np.int64)
    ids = np.unique(pa.concat_tables(parts).column("doc_id").to_numpy())
    if len(ids) > MAX_TOMBSTONES:
        raise RuntimeError(
            f"{len(ids)} tombstones at {path} exceed the broadcast gate "
            f"({MAX_TOMBSTONES}); run compact_*_index() first"
        )
    return ids


def drop_tombstoned(ds, tombstones: np.ndarray, id_col: str):
    """Vectorized live-docs filter over a Dataset (no-op for empty sets)."""
    if len(tombstones) == 0:
        return ds
    dead = np.sort(tombstones)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~_isin_sorted(ids, dead)))

    return ds.map_batches(keep, batch_format="pyarrow")


def _isin_sorted(values: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_set, values)
    pos = np.minimum(pos, len(sorted_set) - 1)
    return sorted_set[pos] == values


# --------------------------------------------------------- band index


def append_cosine_band_index(embeddings, path: str) -> None:
    """Append new docs to a written cosine band index: hash with the stored
    (config, seed) from META.json — so band identities and bucket routing are
    identical to the original build — and write new Parquet files into the
    existing ``bucket=N`` partitions plus the vector store.  Existing files
    are never touched (segment-append semantics)."""
    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn

    with open(os.path.join(path, "META.json")) as f:
        meta = json.load(f)
    lsh = CosineLshConfig(**meta["lsh"])
    num_buckets = int(meta["num_buckets"])
    emb = embeddings.select_columns(["vec_id", "embedding"])

    def bucketed(t: pa.Table) -> pa.Table:
        out = cosine_bands_fn(t, lsh)
        return out.append_column(
            "bucket",
            pa.array(
                out.column("band_hash").to_numpy(zero_copy_only=False)
                % np.uint64(num_buckets),
                pa.int32(),
            ),
        )

    emb.map_batches(bucketed, batch_format="pyarrow", batch_size=4096).write_parquet(
        os.path.join(path, "bands"), partition_cols=["bucket"]
    )
    emb.write_parquet(os.path.join(path, "vectors"))


def compact_cosine_band_index(path: str) -> int:
    """Force-merge: drop tombstoned docs from the band postings and vector
    store, then clear the tombstone table.  Returns the number of doc ids
    compacted away.  Queries before and after return identical results
    (pinned)."""
    return _compact(
        path,
        [("bands", "doc_id", ["bucket"]), ("vectors", "vec_id", None)],
    )


# ---------------------------------------------------------- IVF index


def append_ivf_index(embeddings, path: str) -> None:
    """Append new docs to a written IVF index: assign to the EXISTING
    centroids (centroids are never retrained on append — the same contract as
    FAISS IVF add-after-train; retrain by rebuilding) and write new files
    into the existing ``cell=N`` partitions."""
    from elastiknn_ray.stages.ivf import assign_cells

    with open(os.path.join(path, "META.json")) as f:
        cents = np.array(json.load(f)["centroids"], dtype=np.float64)
    assign_cells(embeddings, cents).write_parquet(
        os.path.join(path, "cells"), partition_cols=["cell"]
    )


def compact_ivf_index(path: str) -> int:
    """Force-merge for the IVF layout (see compact_cosine_band_index)."""
    return _compact(path, [("cells", "vec_id", ["cell"])])


# ------------------------------------------------------------- compaction


def _compact(path: str, tables: list[tuple[str, str, list[str] | None]]) -> int:
    """Rewrite each (subdir, id_col, partition_cols) without tombstoned ids,
    atomically per subdir (write to a sibling tmp dir, then swap)."""
    import ray.data as rd

    dead = load_tombstones(path)
    if len(dead) == 0:
        return 0
    for sub, id_col, part_cols in tables:
        src = os.path.join(path, sub)
        tmp = os.path.join(path, f".{sub}.compact-{uuid.uuid4().hex[:8]}")
        ds = drop_tombstoned(rd.read_parquet(src), dead, id_col)
        if part_cols:
            ds.write_parquet(tmp, partition_cols=part_cols)
        else:
            ds.write_parquet(tmp)
        old = os.path.join(path, f".{sub}.old-{uuid.uuid4().hex[:8]}")
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
    shutil.rmtree(os.path.join(path, "tombstones"))
    return int(len(dead))

"""Client-side vector converters — the on-ramp mirroring the reference's
``client-python/elastiknn/utils.py`` (canonical_vectors_to_elastiknn,
csr_to_sparse_bool_vectors, ndarray_to_dense_float_vectors): turn the
canonical scientific-Python shapes (float ndarray, bool ndarray, scipy CSR)
into the engine's Arrow tables, and back.

scipy is not a dependency: CSR input is duck-typed on the standard
``indptr`` / ``indices`` / ``shape`` attributes, so a real
``scipy.sparse.csr_matrix`` works when scipy is installed and a plain
namedtuple-style carrier works without it.

All conversions are vectorized — the offsets/values layout of a CSR matrix
IS the engine's signature layout (sorted-unique indices per row is the I2
invariant, VectorMapper.scala:31; enforced here with one vectorized check
and a per-row sort only when violated).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.stages.hashing import (
    SIGNATURE_SCHEMA,
    decode_u64_lists,
    encode_u64_lists,
)


def _ids(n: int, ids) -> np.ndarray:
    if ids is None:
        return np.arange(n, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) != n:
        raise ValueError(f"ids length {len(ids)} != rows {n}")
    return ids


def ndarray_to_embeddings(arr: np.ndarray, ids=None) -> pa.Table:
    """(N, dims) float ndarray → (vec_id, embedding list<float32>) table —
    the engine's dense corpus shape (Vec.DenseFloat, Vec.scala:45-63).
    Zero-copy flat values + arithmetic offsets."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D array, got shape {arr.shape}")
    n, dims = arr.shape
    offsets = pa.array(np.arange(0, (n + 1) * dims, dims, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, pa.array(arr.reshape(-1), pa.float32()))
    return pa.table(
        {"vec_id": pa.array(_ids(n, ids), pa.int64()), "embedding": emb}
    )


def embeddings_to_ndarray(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Round-trip: (vec_id, embedding) table → (ids, (N, dims) float32)."""
    col = table.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # .values ignores a slice offset and trailing child values (a
    # zero-offset slice of a longer ListArray over-reads); flatten()
    # honors both and is zero-copy for unsliced arrays.
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(col)
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    return ids, flat.reshape(n, -1) if n else flat.reshape(0, 0)


def csr_to_signatures(csr, ids=None) -> pa.Table:
    """CSR boolean matrix → (doc_id, shingles, n_shingles) signature table
    (the engine's Vec.SparseBool; csr_to_sparse_bool_vectors equivalent).
    Accepts any object with ``indptr``/``indices``/``shape``.  Column
    indices become the uint64 shingle IDs; rows whose indices are unsorted
    or duplicated are canonicalized (sorted-unique, I2)."""
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    indices = np.asarray(csr.indices, dtype=np.int64)
    n = csr.shape[0]
    if len(indptr) != n + 1:
        raise ValueError("indptr length != rows + 1")
    if (indices < 0).any():
        raise ValueError("negative column index")
    values = indices.astype(np.uint64)
    sizes = np.diff(indptr)
    # I2 invariant (sorted strictly-ascending per row): one vectorized check
    # over the whole values array — element i violates iff it is not a row
    # start and values[i] <= values[i-1]
    bad = np.zeros(n, dtype=bool)
    if len(values):
        row_start = np.zeros(len(values), dtype=bool)
        row_start[indptr[:-1][sizes > 0]] = True
        viol = (~row_start) & np.r_[False, np.diff(values.astype(np.int64)) <= 0]
        if viol.any():
            bad[np.unique(np.repeat(np.arange(n), sizes)[viol])] = True
    if bad.any():  # canonicalize (sort+dedup) only the violating rows
        parts, sizes_fixed = [], np.empty(n, np.int64)
        for r in range(n):
            seg = values[indptr[r] : indptr[r + 1]]
            if bad[r]:
                seg = np.unique(seg)
            parts.append(seg)
            sizes_fixed[r] = len(seg)
        values = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(sizes_fixed, out=offsets[1:])
    else:
        offsets = indptr
    return pa.table(
        {
            "doc_id": pa.array(_ids(n, ids), pa.int64()),
            "shingles": encode_u64_lists(offsets, values),
            "n_shingles": pa.array(
                np.diff(offsets).astype(np.int32), pa.int32()
            ),
        },
        schema=SIGNATURE_SCHEMA,
    )


def signatures_to_csr_arrays(table: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Round-trip: signature table → (ids, indptr, indices) — feed straight
    into ``scipy.sparse.csr_matrix((data, indices, indptr))`` when scipy is
    available."""
    offsets, values = decode_u64_lists(table.column("shingles"))
    ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    return ids, offsets, values.astype(np.int64)


def bool_ndarray_to_signatures(arr: np.ndarray, ids=None) -> pa.Table:
    """(N, dims) bool ndarray → signature table
    (ndarray_to_sparse_bool_vectors equivalent): column indices of the True
    cells per row, already sorted by construction."""
    arr = np.asarray(arr, dtype=bool)
    if arr.ndim != 2:
        raise ValueError(f"expected a 2-D array, got shape {arr.shape}")
    n = arr.shape[0]
    rows, cols = np.nonzero(arr)
    sizes = np.bincount(rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return pa.table(
        {
            "doc_id": pa.array(_ids(n, ids), pa.int64()),
            "shingles": encode_u64_lists(offsets, cols.astype(np.uint64)),
            "n_shingles": pa.array(sizes.astype(np.int32), pa.int32()),
        },
        schema=SIGNATURE_SCHEMA,
    )


def canonical_to_table(x, ids=None) -> pa.Table:
    """Dispatch mirroring ``canonical_vectors_to_elastiknn``: float ndarray
    → embeddings table; bool ndarray → signature table; CSR-shaped object →
    signature table."""
    if isinstance(x, np.ndarray):
        if x.dtype == bool:
            return bool_ndarray_to_signatures(x, ids)
        return ndarray_to_embeddings(x, ids)
    if hasattr(x, "indptr") and hasattr(x, "indices") and hasattr(x, "shape"):
        return csr_to_signatures(x, ids)
    raise TypeError(f"expected an ndarray or CSR-shaped object, got {type(x)}")

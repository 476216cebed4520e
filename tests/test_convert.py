"""Converter on-ramp tests — client-python/elastiknn/utils.py parity
(canonical_vectors_to_elastiknn / csr / ndarray conversions)."""

from collections import namedtuple

import numpy as np
import pyarrow as pa

from elastiknn_ray.sources.convert import (
    bool_ndarray_to_signatures,
    canonical_to_table,
    csr_to_signatures,
    embeddings_to_ndarray,
    ndarray_to_embeddings,
    signatures_to_csr_arrays,
)
from elastiknn_ray.stages.hashing import decode_u64_lists

FakeCsr = namedtuple("FakeCsr", ["indptr", "indices", "shape"])


def test_ndarray_embedding_roundtrip():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(17, 9)).astype(np.float32)
    t = ndarray_to_embeddings(m, ids=np.arange(100, 117))
    ids, back = embeddings_to_ndarray(t)
    assert (ids == np.arange(100, 117)).all()
    assert (back == m).all()
    assert t.schema.field("embedding").type == pa.list_(pa.float32())


def test_csr_signature_roundtrip_sorted():
    indptr = np.array([0, 3, 3, 5], dtype=np.int64)
    indices = np.array([1, 4, 9, 2, 7], dtype=np.int64)
    t = csr_to_signatures(FakeCsr(indptr, indices, (3, 10)))
    offs, vals = decode_u64_lists(t.column("shingles"))
    assert (offs == indptr).all() and (vals.astype(np.int64) == indices).all()
    assert t.column("n_shingles").to_pylist() == [3, 0, 2]
    ids, indptr2, indices2 = signatures_to_csr_arrays(t)
    assert (indptr2 == indptr).all() and (indices2 == indices).all()


def test_csr_unsorted_rows_canonicalized():
    """Unsorted/duplicated indices violate I2 (VectorMapper.scala:31 sorts at
    index time; SparseUnsortedIndicesSuite regression) — converter fixes
    ONLY the violating rows."""
    indptr = np.array([0, 3, 6], dtype=np.int64)
    indices = np.array([4, 1, 4, 2, 5, 9], dtype=np.int64)
    t = csr_to_signatures(FakeCsr(indptr, indices, (2, 10)))
    offs, vals = decode_u64_lists(t.column("shingles"))
    assert vals[offs[0] : offs[1]].tolist() == [1, 4]
    assert vals[offs[1] : offs[2]].tolist() == [2, 5, 9]


def test_bool_ndarray_and_dispatch():
    arr = np.zeros((3, 6), dtype=bool)
    arr[0, [1, 4]] = True
    arr[2, [0, 5]] = True
    t = bool_ndarray_to_signatures(arr)
    offs, vals = decode_u64_lists(t.column("shingles"))
    assert t.column("n_shingles").to_pylist() == [2, 0, 2]
    assert vals.astype(int).tolist() == [1, 4, 0, 5]
    # dispatch: float → embeddings, bool → signatures, csr-shaped → signatures
    assert "embedding" in canonical_to_table(np.ones((2, 3))).column_names
    assert "shingles" in canonical_to_table(arr).column_names
    assert "shingles" in canonical_to_table(
        FakeCsr(np.array([0, 1]), np.array([2]), (1, 5))
    ).column_names


def test_sliced_list_columns_convert_correctly():
    """ListArray.values ignores a slice offset (pyarrow semantics); the
    converters and _to_matrix must honor the logical window."""
    import numpy as np
    import pyarrow as pa

    from elastiknn_ray.sources.convert import embeddings_to_ndarray
    from elastiknn_ray.stages.knn import _to_matrix

    m = np.arange(24, dtype=np.float32).reshape(6, 4)
    emb = pa.array([list(map(float, r)) for r in m], pa.list_(pa.float32()))
    ids = pa.array(np.arange(6, dtype=np.int64))
    t = pa.table({"vec_id": ids, "embedding": emb}).slice(2, 3)
    got_ids, got = embeddings_to_ndarray(t)
    np.testing.assert_array_equal(got_ids, [2, 3, 4])
    np.testing.assert_array_equal(got, m[2:5])
    np.testing.assert_array_equal(
        _to_matrix(t.column("embedding")), m[2:5].astype(np.float64)
    )


def test_zero_offset_slice_of_longer_list_array():
    """ADVICE r4 (high): a ZERO-offset slice of a longer ListArray still has
    trailing child values — .values returns the FULL child buffer, so the
    old `flatten() if offset else .values` shortcut reshaped trailing rows
    into the matrix.  All three sites must use flatten() unconditionally."""
    import numpy as np
    import pyarrow as pa

    from elastiknn_ray.sources.convert import embeddings_to_ndarray
    from elastiknn_ray.stages.knn import _sort_gathered, _to_matrix

    m = np.arange(8, dtype=np.float32).reshape(4, 2)
    emb = pa.array([list(map(float, r)) for r in m], pa.list_(pa.float32()))
    t = pa.table(
        {"vec_id": pa.array(np.arange(4, dtype=np.int64)), "embedding": emb}
    ).slice(0, 2)

    got = _to_matrix(t.column("embedding"))
    assert got.shape == (2, 2)
    np.testing.assert_array_equal(got, m[:2].astype(np.float64))

    got_ids, got2 = embeddings_to_ndarray(t)
    np.testing.assert_array_equal(got_ids, [0, 1])
    np.testing.assert_array_equal(got2, m[:2])

    ids3, m3 = _sort_gathered([t], "l2")
    np.testing.assert_array_equal(ids3, [0, 1])
    assert m3.shape == (2, 2)
    np.testing.assert_array_equal(m3, m[:2])

"""Multiple independently-mapped vector fields per document.

The reference indexes several vector fields on one document, each with its
own mapping, and validates (query, mapping) compatibility before running
(VectorMapper.scala:125-131 parse-per-field; the multiple/nested-vector
integration suites; docs/pages/api.md:29-81 field-addressed queries).

Ray-Data-native shape: ONE corpus Dataset whose columns carry the fields —
``doc_id`` plus, per sparse-bool field F, blob columns ``F`` / ``F_n``
(the stages/hashing u64-set codec), and per dense-float field F a
``large_binary`` column of float32-LE vectors (fixed width = 4*dims, kept
binary so the corpus survives ``Dataset.join`` — acero rejects list
payloads).  A ``MultiFieldCorpus`` pairs the Dataset with its per-field
mappings and PLAN-TIME validates every query against the addressed field's
mapping (Q7 semantics) before any Ray execution is scheduled."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import ShingleConfig
from elastiknn_ray.stages.hashing import SignatureStage


@dataclass(frozen=True)
class SparseBoolMapping:
    """Field mapped as a sparse-bool vector (hashed k-shingle set)."""

    shingle: ShingleConfig


@dataclass(frozen=True)
class DenseFloatMapping:
    """Field mapped as a dense float vector with FIXED dims — the mapping's
    dims contract, enforced at plan time against every query matrix."""

    dims: int


def encode_f32_vectors(col) -> pa.Array:
    """list<float> column → large_binary of float32-LE blobs (zero-copy
    over the flat values buffer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.ascontiguousarray(
        col.values.to_numpy(zero_copy_only=False).astype(np.float32)
    )
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64) * 4
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(col), [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
    )


def decode_f32_matrix(col, dims: int) -> np.ndarray:
    """large_binary float32-LE column (all cells 4*dims bytes) → (N, dims)
    float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    if pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    if arr.null_count:
        raise ValueError(
            "null field blobs reached decode_f32_matrix; filter null rows "
            "first (missing-vector docs are invisible to this field)"
        )
    if n == 0:
        return np.empty((0, dims), dtype=np.float64)
    buf_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    flat = np.frombuffer(arr.buffers()[2], dtype=np.float32)
    flat = flat[buf_offsets[0] // 4 : buf_offsets[-1] // 4]
    return flat.astype(np.float64).reshape(n, dims)


class MultiFieldCorpus:
    """One logical corpus, N vector fields, each independently mapped."""

    def __init__(self, ds, mappings: dict[str, SparseBoolMapping | DenseFloatMapping]):
        self.ds = ds
        self.mappings = dict(mappings)

    # -- plan-time validation (raises BEFORE any execution is scheduled) --

    def mapping(self, field: str):
        if field not in self.mappings:
            raise ValueError(
                f"unknown vector field {field!r}; mapped fields: "
                f"{sorted(self.mappings)}"
            )
        return self.mappings[field]

    def _sparse_mapping(self, field: str) -> SparseBoolMapping:
        m = self.mapping(field)
        if not isinstance(m, SparseBoolMapping):
            raise ValueError(
                f"field {field!r} is mapped {type(m).__name__}, not sparse_bool"
            )
        return m

    def _dense_mapping(self, field: str) -> DenseFloatMapping:
        m = self.mapping(field)
        if not isinstance(m, DenseFloatMapping):
            raise ValueError(
                f"field {field!r} is mapped {type(m).__name__}, not dense_float"
            )
        return m

    # -- field views (lazy selections over the one corpus Dataset) --

    def sparse_view(self, field: str):
        """(doc_id, shingles, n_shingles) view of a sparse-bool field —
        the input shape of every stages/sparse_knn kernel."""
        self._sparse_mapping(field)

        def shape(t: pa.Table, f=field) -> pa.Table:
            col = t.column(f)
            if col.null_count:  # missing field => invisible to its queries
                import pyarrow.compute as pc

                t = t.filter(pc.is_valid(col))
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "shingles": t.column(f),
                    "n_shingles": t.column(f"{f}_n"),
                }
            )

        return self.ds.select_columns(["doc_id", field, f"{field}_n"]).map_batches(
            shape, batch_format="pyarrow"
        )

    def sparse_term_mask(self, field: str, probe_text: str):
        """Term query on a sparse-bool field (the Lucene term-filter role):
        returns a batch→bool-mask callable testing whether each doc's hashed
        shingle set contains the probe's shingle, computed with the SAME
        shingle pipeline as the field mapping (hash parity by construction).
        Plan-time checks: field is sparse, probe yields exactly one shingle."""
        from elastiknn_ray.stages.hashing import decode_u64_lists
        from elastiknn_ray.text.shingle import shingle_batch

        m = self._sparse_mapping(field)
        _, vals = shingle_batch([probe_text], m.shingle)
        if len(vals) != 1:
            raise ValueError(
                f"probe {probe_text!r} yields {len(vals)} shingles under the "
                f"field's k={m.shingle.k} mapping; term filters need exactly 1"
            )
        probe = np.uint64(vals[0])

        def mask(t: pa.Table, f=field, probe=probe) -> np.ndarray:
            offsets, values = decode_u64_lists(t.column(f))
            hit = np.zeros(len(offsets) - 1, dtype=bool)
            rows = np.flatnonzero(values == probe)
            if len(rows):
                hit[np.searchsorted(offsets, rows, side="right") - 1] = True
            return hit

        return mask

    def dense_view(self, field: str, *, where: str | None = None, mask_fn=None):
        """(vec_id, embedding) view of a dense-float field — the input shape
        of stages/knn kernels.  ``where`` optionally pre-filters rows by an
        Arrow expression over other corpus columns; ``mask_fn`` by a
        batch→bool-mask callable (e.g. a sparse_term_mask on ANOTHER field —
        filter-on-A + kNN-on-B runs in one streaming pass, Q8)."""
        m = self._dense_mapping(field)
        ds = self.ds if where is None else self.ds.filter(expr=where)

        def shape(t: pa.Table, f=field, dims=m.dims) -> pa.Table:
            if mask_fn is not None:
                t = t.filter(pa.array(mask_fn(t)))
            col = t.column(f)
            if col.null_count:  # docs without this vector field are
                import pyarrow.compute as pc  # invisible to its queries

                t = t.filter(pc.is_valid(col))
            mat = decode_f32_matrix(t.column(f), dims)
            return pa.table(
                {
                    "vec_id": t.column("doc_id"),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1).astype(np.float32)), dims
                    ).cast(pa.list_(pa.float32())),
                }
            )

        if where is not None or mask_fn is not None:
            # the filter may reference any corpus column; the shape kernel
            # prunes to (vec_id, embedding) right after it
            return ds.map_batches(shape, batch_format="pyarrow")
        return ds.select_columns(["doc_id", field]).map_batches(
            shape, batch_format="pyarrow"
        )

    # -- field-addressed queries --

    def knn_sparse(self, field: str, query_ids: np.ndarray, k: int, *, metric="jaccard"):
        """Exact set-similarity kNN on a sparse-bool field."""
        from elastiknn_ray.stages.sparse_knn import gather_query_sets, knn_exact_sparse

        view = self.sparse_view(field).materialize()
        qs = gather_query_sets(view, np.asarray(query_ids, dtype=np.int64))
        return knn_exact_sparse(view, qs, k=k, metric=metric)

    def knn_dense(
        self,
        field: str,
        queries: dict,
        k: int,
        *,
        where: str | None = None,
        mask_fn=None,
    ):
        """Exact cosine kNN on a dense-float field; the query matrix's dims
        are validated against the field mapping at plan time."""
        from elastiknn_ray.stages.knn import knn_exact

        m = self._dense_mapping(field)
        qm = np.asarray(queries["matrix"])
        if qm.ndim != 2 or qm.shape[1] != m.dims:
            raise ValueError(
                f"query dims {qm.shape[1] if qm.ndim == 2 else qm.shape} do not "
                f"match field {field!r} mapping dims {m.dims}"
            )
        return knn_exact(
            self.dense_view(field, where=where, mask_fn=mask_fn), queries, k=k
        )


def build_multi_field_corpus(
    docs_ds,
    emb_ds,
    *,
    title_words: int = 8,
    title_shingle: ShingleConfig | None = None,
    dims: int,
):
    """documents (doc_id, text, lang) × embeddings (vec_id, embedding) →
    MultiFieldCorpus with two independently-mapped fields on one table:

    - ``title_sig``  — sparse_bool: hashed shingle set of the doc's first
      ``title_words`` whitespace tokens (vectorized RE2 prefix extraction);
    - ``body_emb``   — dense_float(dims): the doc's embedding, carried as a
      float32 blob through ONE doc_id-keyed hash join.

    The join is the only shuffle; both fields then live in the same blocks,
    so filter-on-A + kNN-on-B runs in one streaming pass."""
    import pyarrow.compute as pc

    cfg = title_shingle or ShingleConfig(k=2)
    sig = SignatureStage(cfg, text_col="title")
    pat = r"^\s*(?P<title>(?:\S+\s+){0," + str(title_words - 1) + r"}\S+)"

    def title_sigs(t: pa.Table) -> pa.Table:
        title = pc.struct_field(pc.extract_regex(t.column("text"), pat), "title")
        title = pc.fill_null(title, "")
        s = sig(
            pa.table({"doc_id": t.column("doc_id"), "title": title})
        )
        return pa.table(
            {
                "doc_id": s.column("doc_id"),
                "title_sig": s.column("shingles"),
                "title_sig_n": s.column("n_shingles"),
                "lang": t.column("lang"),
            }
        )

    left = docs_ds.map_batches(title_sigs, batch_format="pyarrow")

    def emb_blob(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "body_emb": encode_f32_vectors(t.column("embedding")),
            }
        )

    right = emb_ds.map_batches(emb_blob, batch_format="pyarrow")
    # LEFT OUTER: a doc with no embedding row keeps its title field and a
    # NULL body_emb — the reference's missing-vector semantics per field
    # (DocsWithMissingVectorsSuite: the doc stays searchable on the fields
    # it has; dense_view skips the null rows for body queries).
    joined = left.join(
        right,
        join_type="left_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("vec_id",),
    ).select_columns(["doc_id", "title_sig", "title_sig_n", "lang", "body_emb"])
    return MultiFieldCorpus(
        joined,
        {
            "title_sig": SparseBoolMapping(shingle=cfg),
            "body_emb": DenseFloatMapping(dims=dims),
        },
    )

"""Write-path stages: page preparation, shingle signatures, and LSH band
explosion (SURVEY.md §2.2 I1-I4, §3.1).

Flow (all Arrow, zero-copy between stages):

    pages(url, warc_ts, html, text, lang)
      → prepare_batch:   + doc_id (stable hash of url), text extracted from
                           html when the text column is absent/null
      → SignatureStage:  (doc_id, shingles list<uint64> sorted-unique, n_shingles)
      → MinHashBandStage:(doc_id, band_hash uint64) exploded, one row per
                           (doc, table); empty docs → ONE sentinel row
                           (JaccardLshModel.java:37-38 collision semantics)

``MinHashBandStage`` is a callable class → Ray actor pool: LSH coefficients
are derived from (config, seed) once per actor in ``__init__`` — the engine's
ModelCache (ModelCache.scala:10-27).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import JaccardLshConfig, ShingleConfig
from elastiknn_ray.models.minhash import band_hashes
from elastiknn_ray.models.params import derive_minhash
from elastiknn_ray.text.extract import extract_text
from elastiknn_ray.text.shingle import shingle_batch

#: ``shingles`` is the sorted-unique uint64 shingle-ID array serialized as
#: little-endian bytes in a ``large_binary`` cell — the engine's StoredVec
#: (StoredVec.scala:24-92 / ByteBufferSerialization.java:45-75, with
#: fixed-width 8-byte values instead of the reference's var-width encoding).
#: Binary cells (unlike list<uint64>) are legal non-key join payloads in
#: Arrow acero, and decode zero-copy via np.frombuffer.
SIGNATURE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("shingles", pa.large_binary()),
        ("n_shingles", pa.int32()),
    ]
)

BAND_SCHEMA = pa.schema([("doc_id", pa.int64()), ("band_hash", pa.uint64())])


def doc_id_of_url(url: str) -> int:
    """Stable 63-bit doc id from the url (SURVEY.md §4 determinism row)."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF


def doc_ids_of_url_array(col) -> pa.Array:
    """Batched doc-id derivation over a string column: one zero-copy view of
    the Arrow offsets + data buffers, digests taken over memoryview slices —
    no per-row Python string objects, no to_pylist.  The per-row blake2b
    call itself is inherent to the digest choice (id stability is pinned;
    there is no batch API for cryptographic digests).  Byte-identical to
    mapping :func:`doc_id_of_url` over the column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    out = np.empty(n, np.int64)
    if n == 0:
        return pa.array(out, pa.int64())
    if col.null_count:
        raise ValueError("null url in doc-id derivation (validate upstream, I1)")
    bufs = col.buffers()
    # string array: [validity, offsets(int32 or int64), data]
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ].tolist()  # python ints: C-speed memoryview slicing below
    mv = memoryview(bufs[2])
    b2 = hashlib.blake2b
    fb = int.from_bytes
    mask = 0x7FFFFFFFFFFFFFFF
    lo = offs[0]
    for i in range(n):
        hi = offs[i + 1]
        d = b2(mv[lo:hi], digest_size=8).digest()
        out[i] = fb(d, "little") & mask
        lo = hi
    return pa.array(out, pa.int64())


def prepare_batch(batch: pa.Table) -> pa.Table:
    """Ensure ``doc_id`` (stable url hash unless the input already carries
    ids) and ``text`` (extracted from html when absent)."""
    names = set(batch.column_names)
    if "doc_id" in names:
        ids = batch.column("doc_id").cast(pa.int64())
    else:
        ids = doc_ids_of_url_array(batch.column("url"))
    if "text" in names:
        texts = batch.column("text")
    else:
        texts = pa.array(
            [extract_text(h) for h in batch.column("html").to_pylist()], pa.string()
        )
    cols = {"doc_id": ids, "text": texts}
    for extra in ("url", "lang"):
        if extra in names:
            cols[extra] = batch.column(extra)
    return pa.table(cols)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """html → text as a standalone stage (N1) — used when the input carries
    only html; output keeps all input columns plus ``text``."""
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()], pa.string()
    )
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", texts)


class SignatureStage:
    """(doc_id, text) → (doc_id, shingles, n_shingles).  Stateless apart from
    the frozen config; runs as plain tasks."""

    def __init__(self, shingle: ShingleConfig, id_col: str = "doc_id", text_col: str = "text"):
        self.shingle = shingle
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        texts = ["" if t is None else t for t in texts]
        offsets, values = shingle_batch(texts, self.shingle)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col).cast(pa.int64()),
                "shingles": encode_u64_lists(offsets, values),
                "n_shingles": pa.array(np.diff(offsets).astype(np.int32), pa.int32()),
            }
        )


def encode_u64_lists(offsets: np.ndarray, values: np.ndarray) -> pa.Array:
    """(offsets int64 (N+1,), values uint64 (M,)) → large_binary array, one
    cell per list, zero-copy over the values buffer."""
    byte_offsets = (offsets * 8).astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(byte_offsets), pa.py_buffer(np.ascontiguousarray(values))],
    )


def decode_u64_lists(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column of uint64-LE blobs → (offsets int64 (N+1,), flat
    values uint64 (M,)), zero-copy where the layout allows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    if pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    n = len(arr)
    buf_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint64)
    values = data[buf_offsets[0] // 8 : buf_offsets[-1] // 8]
    offsets = (buf_offsets - buf_offsets[0]) // 8
    return offsets.astype(np.int64), values


class MinHashBandStage:
    """Signatures → exploded (doc_id, band_hash) rows (H1 + I3).

    Actor pool: ``map_batches(MinHashBandStage, fn_constructor_kwargs=...,
    concurrency=N)``.  Empty documents emit exactly one sentinel row — the
    reference's empty-vector term has no band prefix, so all L copies are the
    same term and empties collide only with empties
    (JaccardLshModel.java:37-38).
    """

    def __init__(self, lsh: JaccardLshConfig):
        from elastiknn_ray.models.minhash import _Workspace

        self.params = derive_minhash(lsh)
        self.L = lsh.L
        self.ws = _Workspace()  # persistent scratch — see minhash._Workspace

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, values = decode_u64_lists(batch.column("shingles"))
        bh = band_hashes(offsets, values, self.params, self.ws)  # (N, L) uint64
        return _explode_bands(batch, offsets, bh, self.L)


#: Worker-process-level model cache: {config: (params, workspace)}.  Ray task
#: pools reuse worker processes, so caching here gives actor-style parameter
#: reuse (the reference's per-NODE ModelCache, ModelCache.scala:10-27) while
#: keeping task-pool scheduling — parallelism scales with the cluster instead
#: of a fixed actor count.
_MODEL_CACHE: dict = {}


def minhash_bands_fn(batch: pa.Table, lsh: JaccardLshConfig) -> pa.Table:
    """Plain-function variant of MinHashBandStage for task-pool map_batches."""
    from elastiknn_ray.models.minhash import _Workspace

    entry = _MODEL_CACHE.get(lsh)
    if entry is None:
        entry = (derive_minhash(lsh), _Workspace())
        _MODEL_CACHE[lsh] = entry
    params, ws = entry
    offsets, values = decode_u64_lists(batch.column("shingles"))
    bh = band_hashes(offsets, values, params, ws)
    return _explode_bands(batch, offsets, bh, lsh.L)


def _explode_bands(
    batch: pa.Table, offsets: np.ndarray, bh: np.ndarray, L: int
) -> pa.Table:
    doc_ids = batch.column("doc_id").to_numpy()
    empty = (offsets[1:] - offsets[:-1]) == 0
    n_bands = np.where(empty, 1, L).astype(np.int64)
    out_docs = np.repeat(doc_ids, n_bands)
    keep = np.ones(bh.shape, dtype=bool)
    keep[empty, 1:] = False  # one sentinel row per empty doc
    out_hashes = bh[keep]
    return pa.table(
        {
            "doc_id": pa.array(out_docs, pa.int64()),
            "band_hash": pa.array(out_hashes, pa.uint64()),
        }
    )

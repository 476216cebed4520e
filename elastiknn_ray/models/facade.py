"""sklearn-style fit/kneighbors facade over the engine's ANN read paths —
the Ray-Data analogue of the reference's client model
(client-python/elastiknn/models.py:36-82 ``ElastiknnModel.fit`` /
``kneighbors``): one class wraps index construction (fit) and batched
query waves (kneighbors) for every (algorithm, metric) pair the reference
supports (client-python/elastiknn/utils.py:12-24 ``valid_metrics_algos``),
with the same plan-time compatibility validation (Q7,
ElasticsearchQueryBuilder.scala:38-92) the per-function paths enforce.

Input canonicalization mirrors ``canonical_vectors_to_elastiknn``
(client-python/elastiknn/utils.py): float ndarray → dense embeddings,
bool ndarray / CSR → sparse-bool signatures; a ``ray.data.Dataset`` (or
``pa.Table``) already in the engine's schema passes through.  Query ids
are synthetic negatives, so corpus hits are never self-excluded and the
returned indices are POSITIONS into the fitted matrix (the reference
subtracts 1 from its ES ids for the same reason, models.py:76-78).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: (algorithm, metric) pairs — client-python/elastiknn/utils.py:12-24.
VALID_METRICS_ALGOS = [
    ("exact", "l1"),
    ("exact", "l2"),
    ("exact", "cosine"),
    ("exact", "hamming"),
    ("exact", "jaccard"),
    ("lsh", "l2"),
    ("lsh", "cosine"),
    ("lsh", "jaccard"),
    ("lsh", "hamming"),
    ("permutation_lsh", "cosine"),
    ("permutation_lsh", "l2"),
]

_SPARSE_METRICS = {"jaccard", "hamming"}


def dealias_metric(metric: str) -> str:
    """client-python/elastiknn/utils.py:26-33 (euclidean→l2, angular→cosine)."""
    m = metric.lower()
    return {"euclidean": "l2", "angular": "cosine"}.get(m, m)


def _sparse_query_sets(x) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """bool ndarray / CSR → (offsets, values, sizes) ragged sorted index
    lists (the engine's sparse-bool canonical form, I2)."""
    if isinstance(x, np.ndarray):
        if x.dtype != bool:
            raise TypeError("sparse metrics take a bool ndarray or CSR matrix")
        rows, cols = np.nonzero(x)
        n = x.shape[0]
    elif hasattr(x, "indptr") and hasattr(x, "indices"):
        n = x.shape[0]
        offsets = np.asarray(x.indptr, dtype=np.int64)
        values = np.asarray(x.indices, dtype=np.uint64)
        # CSR columns may be unsorted; the engine's invariant is sorted-unique
        out_v = values.copy()
        for i in range(n):  # Q rows — a query wave, not the corpus
            out_v[offsets[i] : offsets[i + 1]] = np.unique(
                values[offsets[i] : offsets[i + 1]]
            )
        return offsets, out_v, np.diff(offsets).astype(np.int64)
    else:
        raise TypeError(f"expected bool ndarray or CSR, got {type(x)}")
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=offsets[1:])
    return offsets, cols.astype(np.uint64), np.diff(offsets).astype(np.int64)


def _pack_bool_rows(x) -> np.ndarray:
    """(n, dims) bool → (n, dims//64) uint64 lane matrix in the engine's
    bit order (bit p = (out[:, p//64] >> (p%64)) & 1 — models/simhash.py)."""
    if hasattr(x, "toarray"):  # CSR
        x = x.toarray().astype(bool)
    if x.shape[1] % 64:
        raise ValueError(
            f"lsh/hamming needs dims % 64 == 0 (got {x.shape[1]}); pad the "
            "trailing bits"
        )
    return np.ascontiguousarray(
        np.packbits(x, axis=1, bitorder="little")
    ).view(np.uint64)


class ElastiknnModel:
    """fit(X) builds the (optional) index over X; kneighbors(Q, k) returns
    (indices, similarities) numpy arrays of shape (len(Q), k), padded with
    -1 / nan when fewer than k neighbors exist — the reference client's
    contract (models.py:63-82).

    ``mapping_params`` feed the LSH config (L, k, w, seed — Mapping.*Lsh);
    ``query_params`` feed the read path (candidates, probes —
    NearestNeighborsQuery.*Lsh).
    """

    def __init__(
        self,
        algorithm: str = "exact",
        metric: str = "cosine",
        mapping_params: dict | None = None,
        query_params: dict | None = None,
    ):
        self._algorithm = algorithm
        self._metric = dealias_metric(metric)
        if (algorithm, self._metric) not in VALID_METRICS_ALGOS:
            raise ValueError(
                f"algorithm {algorithm!r} / metric {metric!r} must be one of "
                f"{VALID_METRICS_ALGOS} (client-python utils.py:12-24)"
            )
        self._mapping_params = dict(mapping_params or {})
        self._query_params = dict(query_params or {})
        self._dims: int | None = None
        self._data = None  # Dataset: embeddings or signatures
        self._index = None  # BandIndex / SparseBandIndex / packed-sig ds

    # ---------------------------------------------------------------- fit

    def fit(self, X, ids=None) -> "ElastiknnModel":
        """X: float ndarray (dense metrics), bool ndarray / CSR (sparse
        metrics), or a Dataset / pa.Table already in the engine schema
        ((vec_id, embedding) dense; (doc_id, shingles, n_shingles) sparse;
        (doc_id, simhash) for lsh/hamming).  ``ids`` overrides the default
        positional int64 ids for array inputs."""
        import ray.data as rd

        from elastiknn_ray.sources.convert import canonical_to_table

        sparse = self._metric in _SPARSE_METRICS
        if isinstance(X, np.ndarray) or hasattr(X, "indptr"):
            self._dims = int(X.shape[1])
            if self._algorithm == "lsh" and self._metric == "hamming":
                # packed uint64 signatures, not ragged index sets
                from elastiknn_ray.stages.simhash import encode_sigs

                sig = _pack_bool_rows(
                    X if isinstance(X, np.ndarray) else X
                )
                n = sig.shape[0]
                the_ids = (
                    np.arange(n, dtype=np.int64)
                    if ids is None
                    else np.asarray(ids, dtype=np.int64)
                )
                table = pa.table(
                    {
                        "doc_id": pa.array(the_ids, pa.int64()),
                        "simhash": encode_sigs(sig),
                    }
                )
            else:
                if sparse and isinstance(X, np.ndarray) and X.dtype != bool:
                    raise TypeError(
                        f"metric {self._metric!r} takes bool vectors"
                    )
                table = canonical_to_table(X, ids)
            ds = rd.from_arrow(table)
        else:
            ds = rd.from_arrow(X) if isinstance(X, pa.Table) else X
            schema = ds.schema()
            if "embedding" in schema.names:
                self._dims = len(
                    ds.take(1)[0]["embedding"]
                )  # one row, cheap
        self._data = ds.materialize()
        self._index = self._build_index()
        return self

    def _lsh_config(self):
        from elastiknn_ray.config import (
            CosineLshConfig,
            HammingLshConfig,
            JaccardLshConfig,
            L2LshConfig,
            PermutationLshConfig,
        )

        p = dict(self._mapping_params)
        if self._algorithm == "permutation_lsh":
            return PermutationLshConfig(**p)
        if self._metric == "jaccard":
            return JaccardLshConfig(**p)
        if self._dims is not None:
            p.setdefault("dims", self._dims)
        if self._metric == "cosine":
            return CosineLshConfig(**p)
        if self._metric == "l2":
            return L2LshConfig(**p)
        if self._metric == "hamming":
            return HammingLshConfig(**p)
        raise AssertionError(self._metric)

    def _build_index(self):
        if self._algorithm == "exact":
            return None
        if self._algorithm == "permutation_lsh":
            return None  # hash-on-read; no persisted band table needed
        from elastiknn_ray.stages.knn import (
            build_cosine_band_index,
            build_l2_band_index,
        )

        lsh = self._lsh_config()
        if self._metric == "cosine":
            return build_cosine_band_index(self._data, lsh)
        if self._metric == "l2":
            return build_l2_band_index(self._data, lsh)
        if self._metric == "jaccard":
            from elastiknn_ray.stages.sparse_knn import build_jaccard_band_index

            return build_jaccard_band_index(self._data, lsh)
        if self._metric == "hamming":
            from elastiknn_ray.stages.knn import sort_band_blocks
            from elastiknn_ray.stages.simhash import bitsample_bands_fn

            return sort_band_blocks(
                self._data.map_batches(
                    bitsample_bands_fn,
                    fn_kwargs={"lsh": lsh},
                    batch_format="pyarrow",
                )
            ).materialize()
        raise AssertionError(self._metric)

    # --------------------------------------------------------- kneighbors

    def kneighbors(
        self, X, n_neighbors: int, return_similarity: bool = False
    ):
        """Query wave → (indices, similarities) of shape (Q, n_neighbors);
        indices are positions/ids from fit, -1-padded; similarities are the
        reference's score conventions (cosine: 1+cos; l1/l2: 1/(1+dist);
        jaccard/hamming: the set similarity)."""
        if self._data is None:
            raise RuntimeError("fit() before kneighbors()")
        q_ids = -1 - np.arange(len(X) if hasattr(X, "__len__") else X.shape[0],
                               dtype=np.int64)
        res = self._kneighbors_ds(X, q_ids, n_neighbors)
        df = res.to_pandas()
        inds = np.full((len(q_ids), n_neighbors), -1, dtype=np.int64)
        sims = np.full((len(q_ids), n_neighbors), np.nan)
        # query ids are -1-i → row = -1 - query_id
        rows = (-1 - df["query_id"].to_numpy()).astype(np.int64)
        ranks = df["rank"].to_numpy().astype(np.int64) - 1  # engine is 1-based
        ok = ranks < n_neighbors
        inds[rows[ok], ranks[ok]] = df["neighbor_id"].to_numpy()[ok]
        sims[rows[ok], ranks[ok]] = df["score"].to_numpy()[ok]
        if return_similarity:
            return inds, sims
        return inds

    def _kneighbors_ds(self, X, q_ids: np.ndarray, k: int):
        qp = dict(self._query_params)
        if self._algorithm == "exact":
            return self._exact_ds(X, q_ids, k)
        if self._algorithm == "permutation_lsh":
            from elastiknn_ray.stages.knn import knn_perm_cosine

            qm = np.asarray(X, dtype=np.float64)
            return knn_perm_cosine(
                self._data,
                {"ids": q_ids, "matrix": qm},
                k,
                perm=self._lsh_config(),
                metric=self._metric,
                **qp,
            )
        # lsh
        if self._metric == "cosine":
            from elastiknn_ray.stages.knn import knn_lsh_cosine

            return knn_lsh_cosine(
                self._data,
                {"ids": q_ids, "matrix": np.asarray(X, np.float64)},
                k,
                corpus_bands=self._index,
                **qp,
            )
        if self._metric == "l2":
            from elastiknn_ray.stages.knn import knn_l2_lsh

            return knn_l2_lsh(
                self._data,
                {"ids": q_ids, "matrix": np.asarray(X, np.float64)},
                k,
                corpus_bands=self._index,
                **qp,
            )
        if self._metric == "jaccard":
            from elastiknn_ray.stages.sparse_knn import knn_lsh_jaccard

            qs = self._sorted_wave(X, q_ids)
            return knn_lsh_jaccard(
                self._data,
                qs,
                k,
                lsh=self._lsh_config(),
                corpus_bands=self._index,
                **qp,
            )
        if self._metric == "hamming":
            from elastiknn_ray.stages.simhash import knn_hamming_lsh

            sig = _pack_bool_rows(np.asarray(X))
            order = np.argsort(q_ids, kind="stable")
            return knn_hamming_lsh(
                self._data,
                {"ids": q_ids[order], "sig": sig[order]},
                k,
                lsh=self._lsh_config(),
                corpus_bands=self._index,
                **qp,
            )
        raise AssertionError(self._metric)

    def _sorted_wave(self, X, q_ids: np.ndarray) -> dict:
        """Ragged sparse query wave sorted by ascending id — the order
        gather_query_sets produces and the sparse read paths expect."""
        offsets, values, sizes = _sparse_query_sets(X)
        order = np.argsort(q_ids, kind="stable")
        inv_off = np.zeros(len(q_ids) + 1, np.int64)
        np.cumsum(sizes[order], out=inv_off[1:])
        vals = (
            np.concatenate([values[offsets[i] : offsets[i + 1]] for i in order])
            if len(values)
            else values
        )
        return {
            "ids": q_ids[order],
            "offsets": inv_off,
            "values": vals,
            "sizes": sizes[order],
        }

    def _exact_ds(self, X, q_ids: np.ndarray, k: int):
        if self._metric in _SPARSE_METRICS:
            from elastiknn_ray.stages.sparse_knn import knn_exact_sparse

            qs = self._sorted_wave(X, q_ids)
            return knn_exact_sparse(self._data, qs, k, metric=self._metric)
        qm = np.asarray(X, dtype=np.float64)
        if self._metric == "cosine":
            from elastiknn_ray.stages.knn import knn_exact

            return knn_exact(self._data, {"ids": q_ids, "matrix": qm}, k)
        from elastiknn_ray.stages.knn import knn_exact_metric

        return knn_exact_metric(
            self._data, {"ids": q_ids, "matrix": qm}, k, metric=self._metric
        )

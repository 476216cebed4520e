"""Exact verification of candidate pairs (SURVEY.md §2.3 Q3 + §2.1 H6).

Mirrors the reference's re-scoring contract: the final decision for every
candidate uses the EXACT similarity computed from the stored vectors, never
the approximate hash-collision count (HashingQuery.scala:23-38,
MatchHashesAndScoreQuery.java:100-130).  The Lucene doc-values point lookup
(StoredVecReader.scala:8-27) becomes a hash-partitioned ``Dataset.join`` of
the pair table against the signatures table on each side's doc id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.models.exact import jaccard_similarity
from elastiknn_ray.stages.hashing import decode_u64_lists


def _jaccard_batch(batch: pa.Table) -> pa.Table:
    ao, av = decode_u64_lists(batch.column("shingles_a"))
    bo, bv = decode_u64_lists(batch.column("shingles_b"))
    j = jaccard_similarity(ao, av, bo, bv)
    return pa.table(
        {
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "n_bands": batch.column("n_bands"),
            "jaccard": pa.array(j, pa.float64()),
        }
    )


def verify_pairs(pairs, signatures, tau: float, *, num_partitions: int = 32):
    """pairs(doc_a, doc_b, n_bands) ⋈ signatures(doc_id, shingles) on both
    sides → exact Jaccard → filter(jaccard >= tau).

    Returns (doc_a, doc_b, n_bands, jaccard).  Both joins are shuffle hash
    joins keyed on doc id (uniformly distributed — ids are url hashes), so no
    join-side skew handling is needed; pair-side skew was already capped at
    candidate generation.
    """
    import ray.data as rd

    # A zero-row pair set loses its schema through the shuffle and breaks the
    # acero join ("no match for key field"); the candidate set is orders of
    # magnitude smaller than the corpus (deduped + hot-band-capped), so
    # pinning it here is cheap and also lets resumable callers count it.
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_bands": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    sig = signatures.select_columns(["doc_id", "shingles"])
    a = pairs.join(
        sig,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("doc_id",),
    )
    a = a.rename_columns({"shingles": "shingles_a"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "shingles_a"]
    )
    b = a.join(
        sig,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("doc_id",),
    )
    b = b.rename_columns({"shingles": "shingles_b"}).select_columns(
        ["doc_a", "doc_b", "n_bands", "shingles_a", "shingles_b"]
    )
    scored = b.map_batches(_jaccard_batch, batch_format="pyarrow")
    return scored.map_batches(
        lambda t, tau=tau: t.filter(
            pa.compute.greater_equal(t.column("jaccard"), pa.scalar(float(tau)))
        ),
        batch_format="pyarrow",
    )

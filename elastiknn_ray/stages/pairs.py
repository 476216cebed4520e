"""Candidate-pair generation from exploded band rows (SURVEY.md §2.5 N3).

The reference never materializes pairs — Lucene's inverted index realizes
"docs sharing a hash" as a posting list scanned per query
(MatchHashesAndScoreQuery.java:52-85).  For all-pairs dedup the equivalent is
a ``groupby(band_hash)`` shuffle: each group IS the posting list, and we emit
its candidate pairs.

Skew handling (SURVEY.md §4 "hot keys"): a band group of size g would emit
g·(g-1)/2 pairs.  Groups with g <= ``hot_band_cap`` emit all pairs.  Hotter
groups (boilerplate shingle sets, the empty-vector sentinel band) emit
- star pairs (min_doc, x) for every member x — O(g), guarantees the group
  stays connected for union-find so clustering recall is preserved, and
- all pairs within deterministic consecutive cells of <= cap members (docs
  sorted by id) — restores local verification density.
This caps per-group output at ~g·(cap+2)/2 and makes worst-case memory linear
in g.  The trade-off (some non-adjacent true pairs in a hot band are only
connected transitively through the star center) is intentional and documented.

Cross-band pair dedup + band-collision counting happens downstream in one
``groupby(doc_a, doc_b).count()`` — the count is the reference's per-pair
match count (Q1 / ArrayHitCounter.java:22-53 semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count

PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def pairs_within(doc_ids: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs (a < b) among ``doc_ids`` with the hot-group policy
    above.  ``doc_ids`` need not be sorted or unique."""
    ids = np.unique(doc_ids)
    g = len(ids)
    if g < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if g <= cap:
        iu, ju = np.triu_indices(g, k=1)
        return ids[iu], ids[ju]
    # hot group: star around the min + all-pairs inside consecutive cells
    a_parts = [np.full(g - 1, ids[0], dtype=np.int64)]
    b_parts = [ids[1:]]
    for lo in range(1, g, cap):
        cell = ids[lo : lo + cap]
        if len(cell) >= 2:
            iu, ju = np.triu_indices(len(cell), k=1)
            a_parts.append(cell[iu])
            b_parts.append(cell[ju])
    return np.concatenate(a_parts), np.concatenate(b_parts)


def emit_pairs_fn(cap: int):
    """``groupby("band_hash").map_groups`` function emitting candidate pairs."""

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a, b = pairs_within(group["doc_id"].to_numpy(), cap)
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    return emit_pairs


def candidate_pairs(bands, cap: int, *, count_col: str = "n_bands"):
    """bands(doc_id, band_hash) → deduped pairs (doc_a, doc_b, n_bands).

    Two shuffles: the band grouping and the cross-band pair dedup; both keys
    are uniform hashes so only intra-band skew (handled by the cap) matters.
    """
    pairs = bands.groupby("band_hash").map_groups(
        emit_pairs_fn(cap), batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name=count_col))

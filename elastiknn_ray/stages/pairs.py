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
coarse-keyed shuffle + vectorized run-sum per partition — the count is the
reference's per-pair match count (Q1 / ArrayHitCounter.java:22-53
semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa



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


def emit_pairs_partition(table: pa.Table, cap: int) -> pa.Table:
    """Vectorized pair emission over one hash partition of band rows.

    Sorts the partition by band_hash, finds equal-hash runs with one
    ``np.diff``, and emits pairs only for runs of length >= 2 (rare relative
    to the singleton majority).  Pairs are pre-deduped WITH counts inside the
    partition, shrinking the downstream cross-band dedup shuffle (a
    combiner in the MapReduce sense).
    """
    hashes = table.column("band_hash").to_numpy(zero_copy_only=False)
    docs = table.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.argsort(hashes, kind="stable")
    hashes = hashes[order]
    docs = docs[order]
    # run boundaries of equal band_hash
    starts = np.flatnonzero(np.r_[True, hashes[1:] != hashes[:-1]])
    ends = np.r_[starts[1:], len(hashes)]
    a_parts, b_parts = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        a, b = pairs_within(docs[s:e], cap)
        a_parts.append(a)
        b_parts.append(b)
    if not a_parts:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    # partial (combiner-style) dedup: unique (a, b) with multiplicity, via
    # lexsort + run-length detection (doc ids are full 63-bit hashes)
    order = np.lexsort((b, a))
    a = a[order]
    b = b[order]
    new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, len(a)])
    return pa.table(
        {
            "doc_a": pa.array(a[starts], pa.int64()),
            "doc_b": pa.array(b[starts], pa.int64()),
            "cnt": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def grouped_pair_count(
    ds,
    a_col: str,
    b_col: str,
    *,
    count_col: str = "n",
    cnt_col: str | None = None,
    num_partitions: int = 64,
):
    """Vectorized (a, b) group count/sum: coarse hash-partition shuffle + one
    lexsort/reduceat kernel per partition.  ``cnt_col`` sums an existing
    count column; None counts rows.  (Ray's built-in multi-key aggregate
    walks groups in Python — ruinous at many distinct keys.)"""

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part",
            pa.array(
                (
                    t.column(a_col).to_numpy(zero_copy_only=False).view(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    ^ t.column(b_col).to_numpy(zero_copy_only=False).view(np.uint64)
                )
                % np.uint64(num_partitions),
                pa.uint64(),
            ),
        )

    def kernel(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False)
        b = t.column(b_col).to_numpy(zero_copy_only=False)
        cnt = (
            t.column(cnt_col).to_numpy(zero_copy_only=False)
            if cnt_col
            else np.ones(len(a), dtype=np.int64)
        )
        order = np.lexsort((b, a))
        a, b, cnt = a[order], b[order], cnt[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(cnt, starts)
        return pa.table(
            {
                a_col: pa.array(a[starts], pa.int64()),
                b_col: pa.array(b[starts], pa.int64()),
                count_col: pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: kernel(t.drop_columns(["part"])), batch_format="pyarrow")
    )


def candidate_pairs(
    bands, cap: int, *, count_col: str = "n_bands", num_partitions: int = 64
):
    """bands(doc_id, band_hash) → deduped pairs (doc_a, doc_b, n_bands).

    Two shuffles, both on uniform keys: (1) co-locate equal band hashes by
    grouping on the coarse key ``band_hash % num_partitions`` — each group is
    a whole partition processed by ONE vectorized kernel call (not one Python
    call per band group); (2) cross-band pair dedup, fed by per-partition
    partial counts (combiner) so shuffle rows ≈ distinct pairs, not raw pairs.
    The coarse key is uniform (band hashes are uniform); intra-partition hot
    band groups are bounded by the cap, so partition work is O(rows + pairs).
    """
    keyed = bands.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                t.column("band_hash").to_numpy(zero_copy_only=False)
                % np.uint64(num_partitions),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = keyed.groupby("part").map_groups(
        lambda t, cap=cap: emit_pairs_partition(t, cap),
        batch_format="pyarrow",
    )
    # cross-band dedup: one more coarse-keyed shuffle + vectorized run-sum
    # per partition (Ray's built-in multi-key aggregate walks groups in
    # Python — ruinous at millions of distinct pairs)
    repart = pairs.map_batches(
        lambda t: t.append_column(
            "part",
            pa.array(
                (
                    t.column("doc_a").to_numpy(zero_copy_only=False).view(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    ^ t.column("doc_b").to_numpy(zero_copy_only=False).view(np.uint64)
                )
                % np.uint64(num_partitions),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )

    def dedup_sum(t: pa.Table, c=count_col) -> pa.Table:
        a = t.column("doc_a").to_numpy(zero_copy_only=False)
        b = t.column("doc_b").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, cnt = a[order], b[order], cnt[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(cnt, starts)
        return pa.table(
            {
                "doc_a": pa.array(a[starts], pa.int64()),
                "doc_b": pa.array(b[starts], pa.int64()),
                c: pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return repart.groupby("part").map_groups(
        lambda t: dedup_sum(t.drop_columns(["part"])), batch_format="pyarrow"
    )

"""Exact deduplication + first-by-key stages (training-data pipeline ops;
the "exact dedup = hash-partition + per-group first" pattern).

At scale the group key for exact text dedup is a 64-bit content hash added in
a vectorized ``map_batches`` (so the shuffle moves 8-byte keys, not full
texts), then one ``groupby`` keeps the representative.  ``min doc_id`` is the
representative rule — same determinism contract as cluster labels
(SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min


def content_hashes_of(col) -> pa.Array:
    """Vectorized 63-bit content hash of a string column — polars' Rust
    xx-family string hash, zero-copy from Arrow, no per-row Python.

    Nulls hash like "".  The value is a shuffle/grouping key that never
    leaves a run (outputs expose ``doc_id``/``n_dups``, not the hash), so
    within-process determinism (verified cross-worker with a fixed seed)
    suffices; cross-version stability is not required.  Not cryptographic:
    the collision budget at :func:`exact_dedup_groups` (~n^2/2^63) already
    accepts a 64-bit key.  ~18x the old per-row blake2b loop (BASELINE.md
    microbench).
    """
    import polars as pl
    import pyarrow.compute as pc

    if not isinstance(col, pa.ChunkedArray):
        col = pa.chunked_array([col])
    if col.null_count:
        col = pc.fill_null(col, "")
    h = pl.from_arrow(col).hash(seed=0).to_numpy()
    return pa.array(
        (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64), pa.int64()
    )


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a 63-bit ``content_hash`` shuffle key (see
    :func:`content_hashes_of`; vectorized, no per-row Python)."""
    return batch.append_column(
        "content_hash", content_hashes_of(batch.column(text_col))
    )


def exact_dedup_groups(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """(id, text, ...) → (doc_id=min id, n_dups) per distinct content.

    Shuffle key = 64-bit content hash (uniform; no skew handling needed).
    Hash collisions would merge distinct texts — probability ~n^2/2^63,
    negligible below ~10^9 distinct documents; beyond that use a 128-bit
    digest.
    """
    hashed = docs.map_batches(
        lambda b, tc=text_col: add_content_hash(b, tc), batch_format="pyarrow"
    )
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.select_columns(["doc_id", "n_dups"])


def keep_first_in_group(
    docs,
    keys: list[str],
    order_by: list[str],
    *,
    keep_cols: list[str],
    num_partitions: int = 32,
):
    """First row per key group under a total order — e.g. first event per
    (user_id, event_type) by (ts, event_id).  ``order_by`` must be a total
    order for determinism.

    One shuffle on the coarse key ``hash(keys) % num_partitions`` (all rows of
    a group co-locate); per partition the group-first is ONE pandas C-speed
    sort + groupby-head, not a Python call per group.
    """

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy()
        df["_part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return df

    def first_rows(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.sort_values(order_by)
            .groupby(keys, sort=False)
            .head(1)[keep_cols]
        )

    return (
        docs.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(first_rows, batch_format="pandas")
    )

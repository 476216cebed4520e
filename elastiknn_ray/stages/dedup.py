"""Exact deduplication + first-by-key stages (training-data pipeline ops;
the "exact dedup = hash-partition + per-group first" pattern).

At scale the group key for exact text dedup is a 64-bit content hash added in
a vectorized ``map_batches`` (so the shuffle moves 8-byte keys, not full
texts), then one ``groupby`` keeps the representative.  ``min doc_id`` is the
representative rule — same determinism contract as cluster labels
(SURVEY.md §4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized-ish content hashing (blake2b-8 per row; C-speed per call)."""
    texts = batch.column(text_col).to_pylist()
    h = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b((t or "").encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            & 0x7FFFFFFFFFFFFFFF
            for t in texts
        ),
        dtype=np.int64,
        count=len(texts),
    )
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


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

"""The end product of a training-data dedup pipeline: one keep/drop decision
per document, composed from the three dedup paths (SURVEY.md §2.5/§7):

- ``exact``      — verbatim duplicate (content hash): every doc except the
                   min-doc_id representative of its content group drops;
- ``near``       — member of a MinHash-LSH near-dup cluster (exact-Jaccard
                   verified) that is not the cluster representative;
- ``substring``  — more than ``substring_frac`` of the doc's bytes are
                   covered by duplicate spans (suffix-array + winnowing).

Priority: exact > near > substring (a doc matching several reasons reports
the strongest).  Output: (doc_id, keep: bool, reason: string) — reason
"unique" for kept docs.

Composition is pure dataflow (web-scale dup fractions make the drop set
O(corpus), so nothing is collected on the driver): each path emits a
``(doc_id, reason_rank)`` Dataset, the union is reduced with
``groupby(doc_id).min(reason_rank)``, and the corpus is annotated either by
a vectorized broadcast lookup (sorted id array + searchsorted, one ``ray.put``
— only when the drop set fits under BROADCAST_DOC_LIMIT) or by a left-outer
shuffle join on doc_id above that gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from elastiknn_ray.config import DedupConfig
from elastiknn_ray.pipelines.near_dup import near_dup_pipeline
from elastiknn_ray.stages.blocks import drop_empty_blocks
from elastiknn_ray.stages.dedup import add_content_hash
from elastiknn_ray.stages.substring import SubstringConfig, substring_spans
from elastiknn_ray.stages.verify import BROADCAST_DOC_LIMIT

#: reason_rank encoding; index 3 = not dropped.
REASONS = ("exact", "near", "substring", "unique")
_REASON_LOOKUP = pa.array(REASONS, pa.string())

_DROP_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("reason_rank", pa.int64())]
)


def _ranked(ds, rank: int):
    """Project any (doc_id, ...) Dataset to (doc_id, reason_rank=rank)."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "reason_rank": pa.array(np.full(n, rank, np.int64), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _empty_drops():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "reason_rank": pa.array([], pa.int64()),
            }
        )
    )


def _drop_exact(docs):
    """(doc_id,) drop rows: non-representative members of content groups."""
    hashed = docs.map_batches(
        lambda b: add_content_hash(b).select(["doc_id", "content_hash"]),
        batch_format="pyarrow",
    )
    # min doc_id per content hash via the vectorized grouped kernel, then a
    # second pass drops everyone above the min of a multi-member group
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n")
    )
    # an empty right side loses its schema through the shuffle and breaks the
    # acero join — duplicate content groups are rare by nature, so pin + gate
    multi = agg.filter(expr="n > 1").select_columns(
        ["content_hash", "keep_id"]
    ).materialize()
    if multi.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    j = hashed.join(
        drop_empty_blocks(multi),
        join_type="inner",
        num_partitions=8,
        on=("content_hash",),
    )
    return j.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("keep_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def _without_ids(docs, drop_ids, n_drop: int, num_partitions: int):
    """docs minus the (doc_id,) drop set — broadcast searchsorted filter
    under BROADCAST_DOC_LIMIT (one ray.put of a sorted int64 array), else a
    left-outer shuffle join keeping marker-null rows (anti join)."""
    import ray

    if n_drop == 0:
        return docs
    if n_drop <= BROADCAST_DOC_LIMIT:
        parts = [
            b.column("doc_id").to_numpy(zero_copy_only=False)
            for b in drop_ids.iter_batches(batch_format="pyarrow")
        ]
        ids = np.sort(np.concatenate(parts).astype(np.int64))
        ref = ray.put(ids)

        def anti(t: pa.Table) -> pa.Table:
            sids = ray.get(ref)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            p = np.minimum(np.searchsorted(sids, d), len(sids) - 1)
            return t.filter(pa.array(sids[p] != d))

        return docs.map_batches(anti, batch_format="pyarrow")
    marker = drop_ids.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "_drop": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    j = docs.join(
        drop_empty_blocks(marker),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t.column("_drop"))).drop_columns(
            ["_drop"]
        ),
        batch_format="pyarrow",
    )


def _drop_near(clusters):
    """Cluster members that are not the (min-id) representative."""
    return clusters.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column("doc_id"), t.column("cluster_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def _doc_byte_lengths(docs):
    """(doc_id, blen): utf-8 byte length per doc — Arrow strings are utf-8,
    so a zero-copy cast to binary + binary_length gives the byte count."""

    def f(t: pa.Table) -> pa.Table:
        blen = pc.binary_length(t.column("text").cast(pa.large_binary()))
        return pa.table(
            {"doc_id": t.column("doc_id"), "blen": blen.cast(pa.int64())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def _drop_substring(docs, spans, frac: float, num_partitions: int):
    """Docs whose duplicate-span byte coverage exceeds ``frac`` of their
    length.  Spans per doc are non-overlapping (merged upstream), so coverage
    = sum(end - start); composed as groupby + join, never collected."""
    from ray.data.aggregate import Sum

    cov = spans.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "cov": pc.subtract(t.column("end"), t.column("start")).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    agg = cov.groupby("doc_id").aggregate(Sum("cov", alias_name="cov")).materialize()
    n_cov = agg.count()
    if n_cov == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    if n_cov <= BROADCAST_DOC_LIMIT:
        # spanned docs fit the broadcast budget ((doc_id, cov) int64 pairs):
        # one ray.put + a searchsorted lookup inside the existing byte-length
        # pass replaces the inner-join shuffle — same rows, one exchange
        # fewer (the fixed join latency dominated this stage at bench scale)
        import ray

        parts_i, parts_c = [], []
        for b in agg.iter_batches(batch_format="pyarrow"):
            parts_i.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            parts_c.append(b.column("cov").to_numpy(zero_copy_only=False))
        ids = np.concatenate(parts_i).astype(np.int64)
        cv = np.concatenate(parts_c).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], cv[order]))

        def over_bcast(t: pa.Table) -> pa.Table:
            sids, scov = ray.get(ref)
            blen = (
                pc.binary_length(t.column("text").cast(pa.large_binary()))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            p = np.minimum(np.searchsorted(sids, d), len(sids) - 1)
            hit = sids[p] == d
            c = np.where(hit, scov[p], 0).astype(np.float64)
            L = blen.astype(np.float64)
            m = (L > 0) & (c > frac * L)
            return pa.table({"doc_id": pa.array(d[m], pa.int64())})

        return docs.map_batches(over_bcast, batch_format="pyarrow")
    j = _doc_byte_lengths(docs).join(
        drop_empty_blocks(agg),
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def over(t: pa.Table) -> pa.Table:
        c = t.column("cov").to_numpy(zero_copy_only=False).astype(np.float64)
        L = t.column("blen").to_numpy(zero_copy_only=False).astype(np.float64)
        m = (L > 0) & (c > frac * L)
        return pa.table({"doc_id": t.column("doc_id").filter(pa.array(m))})

    return j.map_batches(over, batch_format="pyarrow")


def _annotate_broadcast(docs, ids: np.ndarray, ranks: np.ndarray):
    """Vectorized broadcast annotate: one ray.put of (sorted ids, ranks);
    per batch a searchsorted + take — no Python per-row work."""
    import ray

    order = np.argsort(ids, kind="stable")
    ref = ray.put((ids[order], ranks[order]))

    def annotate(t: pa.Table) -> pa.Table:
        sids, sranks = ray.get(ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        rank = np.full(len(d), 3, np.int64)
        if len(sids):
            p = np.minimum(np.searchsorted(sids, d), len(sids) - 1)
            hit = sids[p] == d
            rank[hit] = sranks[p[hit]]
        reasons = pc.take(_REASON_LOOKUP, pa.array(rank, pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "keep": pa.array(rank == 3),
                "reason": reasons,
            }
        )

    return docs.select_columns(["doc_id"]).map_batches(
        annotate, batch_format="pyarrow"
    )


def _annotate_join(docs, drops, num_partitions: int):
    """Shuffle-join annotate for drop sets above the broadcast gate."""
    j = docs.select_columns(["doc_id"]).join(
        drops,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def annotate(t: pa.Table) -> pa.Table:
        rank = pc.fill_null(t.column("reason_rank"), 3).cast(pa.int64())
        reasons = pc.take(_REASON_LOOKUP, rank)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "keep": pc.equal(rank, pa.scalar(3, pa.int64())),
                "reason": reasons,
            }
        )

    return j.map_batches(annotate, batch_format="pyarrow")


def dedup_decisions(
    docs,
    cfg: DedupConfig,
    sub_cfg: SubstringConfig | None = None,
    *,
    substring_frac: float = 0.5,
    num_partitions: int = 8,
):
    """docs(doc_id, text) → (doc_id, keep, reason)."""
    sub_cfg = sub_cfg or SubstringConfig(num_partitions=num_partitions)
    docs = docs.materialize()
    res = near_dup_pipeline(docs, cfg, num_partitions=num_partitions)
    # exact drops first: their reason is "exact" (rank 0) no matter what the
    # span stage says, and their min-id representative carries identical
    # text, so excluding them from the span corpus loses no span content —
    # it only stops the suffix-array stage re-processing verbatim clones
    # (at web dup rates a large fraction of the corpus).
    exact_drops = _drop_exact(docs).materialize()
    span_docs = _without_ids(
        docs, exact_drops, exact_drops.count(), num_partitions
    )
    spans = substring_spans(span_docs, sub_cfg)
    return decisions_from(
        docs,
        res.clusters,
        spans,
        substring_frac=substring_frac,
        num_partitions=num_partitions,
        exact_drops=exact_drops,
    )


def decisions_from(
    docs,
    clusters,
    spans,
    *,
    substring_frac: float = 0.5,
    num_partitions: int = 8,
    exact_drops=None,
):
    """Compose the decision table from PRECOMPUTED clusters + spans (the
    checkpointed pipeline feeds persisted stage outputs here; dedup_decisions
    wires the live pipelines).  docs must be materialized.  ``exact_drops``
    (a (doc_id,) Dataset) reuses a precomputed exact-drop set; None computes
    it here."""
    from ray.data.aggregate import Min

    sources = (
        exact_drops if exact_drops is not None else _drop_exact(docs),
        _drop_near(clusters),
        _drop_substring(docs, spans, substring_frac, num_partitions),
    )
    # small-drops fast path: each source is a (doc_id,) Dataset far smaller
    # than the corpus; when their union fits the broadcast budget, reduce
    # min(reason_rank) per doc in numpy instead of paying the union +
    # groupby(Min) exchange (a fixed-latency shuffle that dominated the
    # decisions stage at bench scale).  Falls through to the dataflow
    # reduction the moment any source exceeds the budget.
    collected: list[np.ndarray] | None = []
    budget = BROADCAST_DOC_LIMIT
    for src in sources:
        if collected is None:
            break
        parts = []
        for b in src.iter_batches(batch_format="pyarrow"):
            budget -= b.num_rows
            if budget < 0:
                collected = None
                break
            parts.append(b.column("doc_id").to_numpy(zero_copy_only=False))
        if collected is not None:
            collected.append(
                np.concatenate(parts).astype(np.int64)
                if parts
                else np.array([], np.int64)
            )
    if collected is not None:
        ids = np.concatenate(collected)
        ranks = np.concatenate(
            [np.full(len(c), r, np.int64) for r, c in enumerate(collected)]
        )
        if len(ids) == 0:
            return _annotate_broadcast(
                docs, np.array([], np.int64), np.array([], np.int64)
            )
        order = np.lexsort((ranks, ids))
        ids, ranks = ids[order], ranks[order]
        first = np.r_[True, ids[1:] != ids[:-1]]
        return _annotate_broadcast(docs, ids[first], ranks[first])
    drops = (
        _ranked(sources[0], 0)
        .union(_ranked(sources[1], 1))
        .union(_ranked(sources[2], 2))
    )
    # strongest reason per doc; materialize to gate the annotate strategy
    # (the reduced set is (int64, int64) rows — tiny relative to the corpus)
    agg = (
        drops.groupby("doc_id")
        .aggregate(Min("reason_rank", alias_name="reason_rank"))
        .materialize()
    )
    n_drop = agg.count()
    if n_drop == 0:
        return _annotate_broadcast(
            docs, np.array([], np.int64), np.array([], np.int64)
        )
    agg = drop_empty_blocks(agg)
    if n_drop <= BROADCAST_DOC_LIMIT:
        parts_i, parts_r = [], []
        for b in agg.iter_batches(batch_format="pyarrow"):
            parts_i.append(b.column("doc_id").to_numpy(zero_copy_only=False))
            parts_r.append(b.column("reason_rank").to_numpy(zero_copy_only=False))
        return _annotate_broadcast(
            docs,
            np.concatenate(parts_i).astype(np.int64),
            np.concatenate(parts_r).astype(np.int64),
        )
    return _annotate_join(docs, agg, num_partitions)

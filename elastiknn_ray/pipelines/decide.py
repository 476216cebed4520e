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

Each path's drop set is orders of magnitude smaller than the corpus, so the
composition broadcasts the (doc_id → reason) map and annotates in one
streaming pass; above BROADCAST_DOC_LIMIT-scale drop sets the same
composition runs as a left join on doc_id (the standard fallback used by the
verify stages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from elastiknn_ray.config import DedupConfig
from elastiknn_ray.pipelines.near_dup import near_dup_pipeline
from elastiknn_ray.stages.dedup import add_content_hash
from elastiknn_ray.stages.substring import SubstringConfig, substring_spans


def _drop_exact(docs):
    """(doc_id,) drop rows: non-representative members of content groups."""
    from elastiknn_ray.stages.pairs import grouped_pair_count

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
        multi, join_type="inner", num_partitions=8, on=("content_hash",)
    )
    return j.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t.column("doc_id"), t.column("keep_id"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


def dedup_decisions(
    docs,
    cfg: DedupConfig,
    sub_cfg: SubstringConfig | None = None,
    *,
    substring_frac: float = 0.5,
    num_partitions: int = 8,
):
    """docs(doc_id, text) → (doc_id, keep, reason)."""
    import ray

    sub_cfg = sub_cfg or SubstringConfig(num_partitions=num_partitions)
    docs = docs.materialize()

    # --- collect the three (small) drop sets -------------------------------
    exact_ids = set()
    for b in _drop_exact(docs).iter_batches(batch_format="pyarrow"):
        exact_ids.update(b.column("doc_id").to_pylist())

    res = near_dup_pipeline(docs, cfg, num_partitions=num_partitions)
    near_ids = set()
    for b in res.clusters.iter_batches(batch_format="pyarrow"):
        for d, c in zip(
            b.column("doc_id").to_pylist(), b.column("cluster_id").to_pylist()
        ):
            if d != c:  # cluster representative (min id) is kept
                near_ids.add(d)

    spans = substring_spans(docs, sub_cfg)
    cover: dict[int, int] = {}
    for b in spans.iter_batches(batch_format="pyarrow"):
        for d, s, e in zip(
            b.column("doc_id").to_pylist(),
            b.column("start").to_pylist(),
            b.column("end").to_pylist(),
        ):
            cover[d] = cover.get(d, 0) + (e - s)

    # byte lengths only for docs with spans (small)
    span_docs = np.array(sorted(cover), dtype=np.int64)
    ref_ids = ray.put(span_docs)

    def lens_batch(t: pa.Table) -> pa.Table:
        ids = ray.get(ref_ids)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "blen": pa.array([], pa.int64())}
            )
        p = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        m = ids[p] == d
        texts = [
            len((x or "").encode("utf-8"))
            for x, keep in zip(t.column("text").to_pylist(), m.tolist())
            if keep
        ]
        return pa.table(
            {
                "doc_id": pa.array(d[m], pa.int64()),
                "blen": pa.array(texts, pa.int64()),
            }
        )

    substr_ids = set()
    for b in docs.map_batches(lens_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for d, L in zip(b.column("doc_id").to_pylist(), b.column("blen").to_pylist()):
            if L > 0 and cover.get(d, 0) / L > substring_frac:
                substr_ids.add(d)

    # --- one streaming annotation pass -------------------------------------
    reason_map = {}
    for d in substr_ids:
        reason_map[d] = "substring"
    for d in near_ids:
        reason_map[d] = "near"
    for d in exact_ids:
        reason_map[d] = "exact"  # highest priority overwrites
    map_ref = ray.put(reason_map)

    def annotate(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = t.column("doc_id").to_pylist()
        reasons = [m.get(d, "unique") for d in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "keep": pa.array([r == "unique" for r in reasons], pa.bool_()),
                "reason": pa.array(reasons, pa.string()),
            }
        )

    return docs.select_columns(["doc_id"]).map_batches(
        annotate, batch_format="pyarrow"
    )

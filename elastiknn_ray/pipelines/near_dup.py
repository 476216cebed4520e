"""The flagship pipeline: MinHash-LSH near-duplicate detection + clustering
(SURVEY.md §3.2 "Ray Data equivalent").

    pages(url, [html|text], ...)
      → prepare (doc_id, text)                  [stateless map_batches]
      → signatures (doc_id, shingles)           [stateless map_batches]
      → bands (doc_id, band_hash) exploded      [task pool + per-worker model cache]
      → candidate pairs                         [coarse groupby(band_hash % P), salted]
      → cross-band dedup + collision count      [coarse groupby(hash(pair) % P)]
      → exact-Jaccard verify                    [zero-copy shard-ref gather, or
                                                 2 hash joins above the size gate]
      → union-find                              [driver fast path <= 2M edges,
                                                 else star-contraction fixpoint]
      → clusters (doc_id, cluster_id)

Decisions always come from exact Jaccard (>= tau), matching the reference's
exact re-scoring contract (HashingQuery.scala:23-38).  Every wide step's key
is stated inline; the only skewed key (band_hash of boilerplate/empty bands)
is capped + star-connected at pair generation (stages/pairs.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from elastiknn_ray.config import DedupConfig
from elastiknn_ray.stages.hashing import (
    SignatureStage,
    minhash_bands_fn,
    prepare_batch,
)
from elastiknn_ray.stages.pairs import candidate_pairs
from elastiknn_ray.stages.verify import verify_pairs
from elastiknn_ray.stages.components import connected_components


@dataclass
class NearDupResult:
    signatures: object  # Dataset(doc_id, shingles, n_shingles)
    pairs: object  # Dataset(doc_a, doc_b, n_bands, jaccard) — verified
    clusters: object  # Dataset(doc_id, cluster_id) — only docs in some cluster


def signatures_of(pages, cfg: DedupConfig, *, band_concurrency=None):
    """pages → (signatures, bands) datasets."""
    docs = pages.map_batches(prepare_batch, batch_format="pyarrow")
    sigs = docs.map_batches(
        SignatureStage(cfg.shingle), batch_format="pyarrow", batch_size=1024
    )
    # task pool + worker-process model cache (hashing._MODEL_CACHE): the
    # hashing stage scales with the cluster, not a fixed actor count
    bands = sigs.map_batches(
        minhash_bands_fn,
        fn_kwargs={"lsh": cfg.lsh},
        batch_format="pyarrow",
        batch_size=1024,
    )
    return sigs, bands


def near_dup_pipeline(
    pages, cfg: DedupConfig, *, num_partitions: int = 32, band_concurrency=None
) -> NearDupResult:
    """Run the full near-dup pipeline lazily; nothing materializes until the
    caller consumes a result dataset (except the union-find rounds, which
    materialize the — much smaller — verified-pair edge list)."""
    sigs, bands = signatures_of(pages, cfg, band_concurrency=band_concurrency)
    # signatures are consumed twice (verify joins) — pin them once instead of
    # recomputing the whole upstream pipeline per consumer
    sigs = sigs.materialize()
    cands = candidate_pairs(bands, cfg.hot_band_cap)
    verified = verify_pairs(cands, sigs, cfg.tau, num_partitions=num_partitions)
    verified = verified.materialize()
    edges = verified.select_columns(["doc_a", "doc_b"]).rename_columns(
        {"doc_a": "u", "doc_b": "v"}
    )
    clusters = connected_components(edges)
    return NearDupResult(signatures=sigs, pairs=verified, clusters=clusters)


def simhash_near_dup_pipeline(
    pages, cfg, *, num_partitions: int = 8, band_concurrency=None
) -> NearDupResult:
    """The SimHash/Hamming near-dup path (SURVEY.md §7 M6): shingle →
    SimHash packed signature → bit-sampling bands (HammingLshModel mirror)
    → candidate pairs (shared shuffle stage) → exact packed-Hamming verify
    → union-find.  ``cfg`` is a SimHashDedupConfig.
    """
    from elastiknn_ray.stages.simhash import (
        SimHashStage,
        bitsample_bands_fn,
        verify_hamming_pairs,
    )

    docs = pages.map_batches(prepare_batch, batch_format="pyarrow")
    shingled = docs.map_batches(
        SignatureStage(cfg.shingle), batch_format="pyarrow", batch_size=1024
    )
    sigs = shingled.map_batches(
        SimHashStage(cfg.dims), batch_format="pyarrow", batch_size=1024
    ).materialize()
    bands = sigs.map_batches(
        bitsample_bands_fn,
        fn_kwargs={"lsh": cfg.lsh},
        batch_format="pyarrow",
        batch_size=1024,
    )
    cands = candidate_pairs(bands, cfg.hot_band_cap)
    verified = verify_hamming_pairs(
        cands, sigs, cfg.dims, cfg.tau, num_partitions=num_partitions
    )
    verified = verified.materialize()
    edges = verified.select_columns(["doc_a", "doc_b"]).rename_columns(
        {"doc_a": "u", "doc_b": "v"}
    )
    clusters = connected_components(edges)
    return NearDupResult(signatures=sigs, pairs=verified, clusters=clusters)

#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode: run every registry query from ``elastiknn_ray.pipelines.queries``
over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and print
ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

``--scaling``: run the flagship near-dup pipeline twice in FRESH subprocesses
(num_cpus=8 then num_cpus=32) over the same deterministic synthetic corpus
(sources/synth.py; no external data) and report docs/sec at both plus the
scaling efficiency ``(T_8 / T_32) / (32 / 8)`` — the sandbox stand-in for the
north rule's N-node vs 4N-node cluster criterion (SURVEY.md §4, §6).

Only this script (and the pytest fixture) owns the Ray session.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
#: synthetic-corpus size for the scaling runs: big enough that fixed Ray/plan
#: overhead (~seconds) is small vs compute, small enough to finish in minutes.
SCALING_DOCS = int(os.environ.get("BENCH_SCALING_DOCS", "150000"))
SCALING_SEED = 42


def _consume(res) -> int:
    """Force full execution of a query result; return its row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    # ray.data.Dataset: materialize() executes every block (count() alone can
    # shortcut via metadata for trivial plans)
    return res.materialize().count()


def _init_ray(num_cpus: int) -> None:
    import os

    import ray

    if not ray.is_initialized():
        kwargs = {}
        # Large scale points (e.g. --decisions --docs 1000000) keep several
        # materialized checkpoint stages alive at once; this host's raylet
        # SIGSEGVs in its spill-worker path (PushSpillWorker) under spill
        # pressure, so size the store to hold the working set instead.
        obj_gb = os.environ.get("GRAFT_OBJ_STORE_GB")
        if obj_gb:
            kwargs["object_store_memory"] = int(float(obj_gb) * (1 << 30))
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    # keep stdout clean: the driver parses the single JSON line this script
    # prints, so nothing else may land on stdout
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_queries(sf_dir: str, num_cpus: int, repeats: int | None = None) -> dict:
    """Registry bench with a jitter-controlled protocol: every entry runs
    ``repeats`` times (default 2, env GRAFT_BENCH_REPEATS) and reports its
    BEST time.  The sandbox host shows 1.5-2x wall-time jitter under
    contention (BASELINE.md), so single-sample per-entry times cannot
    distinguish a regression from a noisy neighbor; per-entry minima can.
    Row counts are asserted identical across passes (determinism check)."""
    repeats = repeats or int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    _init_ray(num_cpus)
    from elastiknn_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.perf_counter()
    for rep in range(max(1, repeats)):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            n = _consume(fn(sf_dir))
            el = round(time.perf_counter() - t0, 3)
            if name in rows and rows[name] != n:
                raise AssertionError(
                    f"{name}: row count changed across passes "
                    f"({rows[name]} vs {n})"
                )
            rows[name] = n
            timings[name] = min(timings.get(name, el), el)
    wall = round(time.perf_counter() - t_all, 3)
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    return {
        "metric": "e2e_registry_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf_val,
        "num_cpus": num_cpus,
        "protocol": f"best-of-{max(1, repeats)} per entry",
        "wall_sec_all_passes": wall,
    }


def run_flagship(num_cpus: int, n_docs: int, seed: int) -> dict:
    """One fresh-session flagship run over the synthetic corpus: generate →
    extract → shingle → minhash bands → pairs → verify → cluster."""
    _init_ray(num_cpus)
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline
    from elastiknn_ray.pipelines.queries import DOCS_DEDUP_CFG
    from elastiknn_ray.sources.synth import pages_dataset

    # warm the worker pool before timing: spawning N python workers is a
    # once-per-session cost that would otherwise bias the larger run (steady-
    # state throughput is what the scaling criterion measures)
    import ray.data as rd

    rd.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    # identical logical plan at every CPU level (blocks/partitions fixed) so
    # the scaling comparison varies ONLY the available parallelism
    blocks = 64
    t0 = time.perf_counter()
    pages = pages_dataset(n_docs, seed, override_num_blocks=blocks)
    res = near_dup_pipeline(
        pages,
        DOCS_DEDUP_CFG,
        num_partitions=16,
        band_concurrency=(1, num_cpus),
    )
    n_clustered = res.clusters.materialize().count()
    n_pairs = res.pairs.count()
    elapsed = time.perf_counter() - t0
    return {
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "verified_pairs": n_pairs,
        "clustered_docs": n_clustered,
    }


def run_recall(num_cpus: int, n_docs: int, seed: int) -> dict:
    """The north-rule headline: dup-pair recall of the LSH pipeline against
    ground truth at the operating config.

    Truth = injected clone/near pairs (sources/synth.py truth_pairs) whose
    EXACT shingle Jaccard >= tau — computed directly on the known pairs, so
    the oracle is exact without an O(n^2) scan.  Recall = fraction of truth
    pairs present in the pipeline's verified output.
    """
    _init_ray(num_cpus)
    import numpy as np

    from elastiknn_ray.models.exact import jaccard_similarity
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline
    from elastiknn_ray.pipelines.queries import DOCS_DEDUP_CFG as cfg
    from elastiknn_ray.sources.synth import pages_dataset, truth_pairs, url_of
    from elastiknn_ray.stages.hashing import decode_u64_lists, doc_id_of_url

    pages = pages_dataset(n_docs, seed, override_num_blocks=64)
    res = near_dup_pipeline(pages, cfg, num_partitions=16)

    # signatures of every doc appearing in an injected pair
    tp = truth_pairs(n_docs, seed)
    n_hosts = max(4, n_docs // 50)
    row_to_id = {}
    rows = set(tp.column("doc_a").to_pylist()) | set(tp.column("doc_b").to_pylist())
    for r in rows:
        row_to_id[r] = doc_id_of_url(url_of(r, seed, n_hosts))
    want_ids = np.array(sorted(row_to_id.values()), dtype=np.int64)

    sig_map = {}
    for b in res.signatures.iter_batches(batch_format="pyarrow"):
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        off, vals = decode_u64_lists(b.column("shingles"))
        pos = np.minimum(np.searchsorted(want_ids, ids), len(want_ids) - 1)
        for i in np.flatnonzero(want_ids[pos] == ids):
            sig_map[int(ids[i])] = vals[off[i] : off[i + 1]]

    # exact Jaccard of each injected pair -> truth set at tau
    truth = set()
    for ra, rb in zip(tp.column("doc_a").to_pylist(), tp.column("doc_b").to_pylist()):
        ia, ib = row_to_id[ra], row_to_id[rb]
        sa, sb = sig_map[ia], sig_map[ib]
        ao = np.array([0, len(sa)], dtype=np.int64)
        bo = np.array([0, len(sb)], dtype=np.int64)
        j = jaccard_similarity(ao, sa, bo, sb)[0]
        if j >= cfg.tau:
            truth.add((min(ia, ib), max(ia, ib)))

    found = set()
    for b in res.pairs.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(
            b.column("doc_a").to_pylist(), b.column("doc_b").to_pylist()
        ):
            found.add((min(a_, b_), max(a_, b_)))

    hit = len(truth & found)
    recall = hit / len(truth) if truth else 1.0
    return {
        "metric": "dup_pair_recall",
        "value": round(recall, 5),
        "unit": "ratio",
        "n_docs": n_docs,
        "n_truth_pairs": len(truth),
        "n_truth_hit": hit,
        "num_cpus": num_cpus,
        "config": {
            "shingle_k": cfg.shingle.k,
            "L": cfg.lsh.L,
            "k": cfg.lsh.k,
            "tau": cfg.tau,
        },
        "pass": recall >= 0.99,
    }


def run_ann(num_cpus: int) -> dict:
    """ann-benchmarks-style recall/QPS sweep (the reference's §6 protocol:
    fixed corpus + queries, vary the candidate budget, report recall@k and
    queries/sec) — our LSH kNN read path vs the brute-force exact baseline
    on a deterministic 60k x 128 clustered corpus."""
    _init_ray(num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.stages.knn import (
        build_cosine_band_index,
        knn_exact,
        knn_lsh_cosine,
    )

    n, dims, n_q, k = 60_000, 128, 500, 100
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(256, dims))
    m = (
        centers[rng.integers(0, 256, n)] + 0.35 * rng.normal(size=(n, dims))
    ).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    ).materialize()
    q = {"ids": np.arange(n_q, dtype=np.int64), "matrix": m[:n_q].astype(np.float64)}

    t0 = time.perf_counter()
    exact = knn_exact(emb, q, k=k).to_pandas()
    exact_s = time.perf_counter() - t0
    truth = {
        qi: set(exact[exact["query_id"] == qi]["neighbor_id"]) for qi in range(n_q)
    }

    # fit/query split (ann-benchmarks protocol): build the band index once
    lsh_cfg = CosineLshConfig(dims=dims, L=100, k=12, seed=0)
    t0 = time.perf_counter()
    index = build_cosine_band_index(emb, lsh_cfg, num_blocks=num_cpus)
    fit_s = time.perf_counter() - t0

    points = []
    for candidates in (100, 500, 1000):
        t0 = time.perf_counter()
        approx = knn_lsh_cosine(
            emb, q, k=k, candidates=candidates, lsh=lsh_cfg, corpus_bands=index,
        ).to_pandas()
        el = time.perf_counter() - t0
        recalls = [
            len(truth[qi] & set(approx[approx["query_id"] == qi]["neighbor_id"]))
            / max(len(truth[qi]), 1)
            for qi in range(n_q)
        ]
        points.append(
            {
                "candidates": candidates,
                "recall_at_100": round(float(np.mean(recalls)), 3),
                "qps": round(n_q / el, 1),
                "elapsed_sec": round(el, 2),
            }
        )
    return {
        "metric": "ann_recall_qps",
        "value": points[-1]["recall_at_100"],
        "unit": "recall@100",
        "corpus": {"n": n, "dims": dims, "n_queries": n_q, "k": k},
        "exact_baseline": {"qps": round(n_q / exact_s, 1), "elapsed_sec": round(exact_s, 2)},
        "fit_sec": round(fit_s, 2),
        "lsh_points": points,
        "num_cpus": num_cpus,
    }


def run_ann_l2(num_cpus: int) -> dict:
    """ann-benchmarks-style sweep for the L2 multiprobe read path at the
    reference's PUBLISHED protocol shape (ann-benchmarks/config.yml:20-22:
    Fashion-MNIST 784d / 60k corpus / k=100, L2Lsh L=175 k=7 w=3900,
    candidates 100/500/1000) on a synthetic pixel-scale clustered corpus
    (no network: the real dataset is unavailable, so recall values are not
    comparable 1:1 — the curve shape and QPS are the measurement)."""
    _init_ray(num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.config import L2LshConfig
    from elastiknn_ray.stages.knn import build_l2_band_index, knn_exact_metric, knn_l2_lsh

    n, dims, n_q, k = 60_000, 784, 500, 100
    rng = np.random.default_rng(0)
    # pixel-scale clusters: centers in [0, 255], cluster spread ~ MNIST-ish
    centers = rng.uniform(0, 255, size=(256, dims))
    m = np.clip(
        centers[rng.integers(0, 256, n)] + 35.0 * rng.normal(size=(n, dims)),
        0,
        255,
    ).astype(np.float32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": pa.array(list(m), pa.list_(pa.float32())),
            }
        )
    ).materialize()
    q = {"ids": np.arange(n_q, dtype=np.int64), "matrix": m[:n_q].astype(np.float64)}

    t0 = time.perf_counter()
    exact = knn_exact_metric(emb, q, k=k, metric="l2").to_pandas()
    exact_s = time.perf_counter() - t0
    truth = {
        qi: set(exact[exact["query_id"] == qi]["neighbor_id"]) for qi in range(n_q)
    }

    lsh_cfg = L2LshConfig(dims=dims, L=175, k=7, w=3900, seed=0)
    t0 = time.perf_counter()
    index = build_l2_band_index(emb, lsh_cfg, num_blocks=num_cpus)
    fit_s = time.perf_counter() - t0

    # untimed warmup wave: first indexed-path call pays one-time per-worker
    # costs (worker spawn + stored-vector gather into the per-process cache)
    # that belong to the fit, not the steady-state read path the published
    # ann-benchmarks QPS measures
    t0 = time.perf_counter()
    knn_l2_lsh(
        emb, q, k=k, lsh=lsh_cfg, candidates=100, probes=0, corpus_bands=index
    ).materialize()
    warm_s = time.perf_counter() - t0

    points = []
    reps = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    for candidates, probes in ((100, 0), (500, 0), (1000, 0), (500, 2)):
        # best-of-N per point: this host's wall time jitters 4-15x under
        # hugepage compaction/steal, so a single sample is meaningless
        el = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            approx = knn_l2_lsh(
                emb, q, k=k, lsh=lsh_cfg, candidates=candidates, probes=probes,
                corpus_bands=index,
            ).to_pandas()
            el = min(el, time.perf_counter() - t0)
        recalls = [
            len(truth[qi] & set(approx[approx["query_id"] == qi]["neighbor_id"]))
            / max(len(truth[qi]), 1)
            for qi in range(n_q)
        ]
        points.append(
            {
                "candidates": candidates,
                "probes": probes,
                "recall_at_100": round(float(np.mean(recalls)), 3),
                "qps": round(n_q / el, 1),
                "elapsed_sec": round(el, 2),
            }
        )
    return {
        "metric": "ann_l2_recall_qps",
        "value": points[2]["recall_at_100"],
        "unit": "recall@100",
        "corpus": {"n": n, "dims": dims, "n_queries": n_q, "k": k},
        "exact_baseline": {
            "qps": round(n_q / exact_s, 1),
            "elapsed_sec": round(exact_s, 2),
        },
        "fit_sec": round(fit_s, 2),
        "warmup_sec": round(warm_s, 2),
        "lsh": {"L": lsh_cfg.L, "k": lsh_cfg.k, "w": lsh_cfg.w},
        "lsh_points": points,
        "num_cpus": num_cpus,
    }


def run_ann_jaccard(num_cpus: int) -> dict:
    """ann-benchmarks-style sweep for the SPARSE Jaccard read path
    (knn_lsh_jaccard: MinHash band collisions → one-shuffle count/cut →
    exact-Jaccard re-score) vs the exact sparse baseline, on a deterministic
    60k clustered set corpus — closes the reference's L2/Jaccard sweep gap
    (ann-benchmarks/config.yml covers non-cosine metrics too)."""
    _init_ray(num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.config import JaccardLshConfig
    from elastiknn_ray.stages.hashing import encode_u64_lists
    from elastiknn_ray.stages.sparse_knn import knn_exact_sparse, knn_lsh_jaccard

    n, n_clusters, set_len, universe, n_q, k = 60_000, 512, 150, 16_384, 500, 100
    rng = np.random.default_rng(0)
    protos = np.array(
        [
            rng.choice(universe, size=set_len, replace=False)
            for _ in range(n_clusters)
        ]
    )
    owner = rng.integers(0, n_clusters, n)
    base = protos[owner]  # (n, set_len)
    # resample ~15% of each doc's elements for intra-cluster jaccard ~0.74
    mutate = rng.random((n, set_len)) < 0.15
    noise = rng.integers(0, universe, (n, set_len))
    sets = np.where(mutate, noise, base).astype(np.uint64)
    # sorted-unique invariant (I2)
    arrs = [np.unique(s) for s in sets]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(a) for a in arrs], out=offsets[1:])
    values = np.concatenate(arrs)
    sigs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "shingles": encode_u64_lists(offsets, values),
                "n_shingles": pa.array(
                    np.diff(offsets).astype(np.int32), pa.int32()
                ),
            }
        )
    ).repartition(num_cpus).materialize()
    qs = {
        "ids": np.arange(n_q, dtype=np.int64),
        "offsets": offsets[: n_q + 1].copy(),
        "values": values[: offsets[n_q]],
        "sizes": np.diff(offsets[: n_q + 1]),
    }

    t0 = time.perf_counter()
    exact = knn_exact_sparse(sigs, qs, k=k).to_pandas()
    exact_s = time.perf_counter() - t0
    truth = {
        qi: set(exact[exact["query_id"] == qi]["neighbor_id"]) for qi in range(n_q)
    }

    lsh_cfg = JaccardLshConfig(L=100, k=4, seed=0)
    # fit/query split: SparseBandIndex = hash-sorted band postings + one
    # shared gather of the stored shingle sets (the reference's index-once
    # model); each sweep point only pays the seek-count + in-merge rescore
    from elastiknn_ray.stages.sparse_knn import build_jaccard_band_index

    t0 = time.perf_counter()
    bands = build_jaccard_band_index(sigs, lsh_cfg, num_blocks=num_cpus)
    fit_s = time.perf_counter() - t0
    points = []
    reps = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    for candidates in (100, 500, 1000):
        el = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            approx = knn_lsh_jaccard(
                sigs, qs, k=k, lsh=lsh_cfg, candidates=candidates,
                corpus_bands=bands,
            ).to_pandas()
            el = min(el, time.perf_counter() - t0)
        recalls = [
            len(truth[qi] & set(approx[approx["query_id"] == qi]["neighbor_id"]))
            / max(len(truth[qi]), 1)
            for qi in range(n_q)
        ]
        points.append(
            {
                "candidates": candidates,
                "recall_at_100": round(float(np.mean(recalls)), 3),
                "qps": round(n_q / el, 1),
                "elapsed_sec": round(el, 2),
            }
        )
    return {
        "metric": "ann_jaccard_recall_qps",
        "value": points[-1]["recall_at_100"],
        "unit": "recall@100",
        "corpus": {
            "n": n,
            "universe": universe,
            "set_len": set_len,
            "n_queries": n_q,
            "k": k,
        },
        "exact_baseline": {
            "qps": round(n_q / exact_s, 1),
            "elapsed_sec": round(exact_s, 2),
        },
        "fit_sec": round(fit_s, 2),
        "lsh": {"L": lsh_cfg.L, "k": lsh_cfg.k},
        "lsh_points": points,
        "num_cpus": num_cpus,
    }


def run_emb_dedup(num_cpus: int, n: int, dims: int = 64, seed: int = 0) -> dict:
    """Embedding near-dup at scale: hyperplane-LSH candidate generation +
    broadcast-gated exact-cosine verify over a synthetic clustered corpus
    (the scale path of the emb_cosine_* registry entries; planted near-dup
    pairs give a recall denominator)."""
    _init_ray(num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn, verify_cosine_pairs
    from elastiknn_ray.stages.pairs import candidate_pairs

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dims)).astype(np.float32)
    # bucket math: k=24 sign bits keeps the random-pair collision tail tiny
    # (candidates stay ~O(n)) while planted near-dups at cos ~ 0.997 collide
    # per table w.p. 0.9777^24 ~ 0.58 -> recall ~ 1 - 0.42^16 ~ 1.  (k=10
    # gives only ~1024 effective buckets: O(n^2/1024) candidate pairs.)
    # plant near-dups: 5% of vectors are a tiny perturbation of another
    n_dup = n // 20
    src = rng.integers(0, n - n_dup, n_dup)
    base[n - n_dup :] = base[src] + 0.05 * rng.normal(size=(n_dup, dims)).astype(
        np.float32
    )
    # zero-copy list column: offsets buffer + flat value buffer (building
    # via pa.array(list(...)) walks 200k python objects)
    flat = pa.array(base.reshape(-1), pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * dims, dims, dtype=np.int32))
    emb_col = pa.ListArray.from_arrays(offsets, flat)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "embedding": emb_col,
            }
        )
    ).materialize()
    tau = 0.9
    t0 = time.perf_counter()
    bands = emb.map_batches(
        cosine_bands_fn,
        fn_kwargs={"lsh": CosineLshConfig(dims=dims, L=16, k=24, seed=0)},
        batch_format="pyarrow",
        batch_size=4096,
    )
    cands = candidate_pairs(bands, cap=256)
    pairs = verify_cosine_pairs(cands, emb, tau, num_partitions=16).materialize()
    elapsed = time.perf_counter() - t0
    n_pairs = pairs.count()
    # recall vs planted pairs (true cos ~0.997 at 0.05 sigma perturbation)
    found = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        for a_, b_ in zip(b.column("vec_a").to_pylist(), b.column("vec_b").to_pylist()):
            found.add((min(a_, b_), max(a_, b_)))
    import numpy.linalg as la

    planted_hit = 0
    planted = 0
    for i, s in enumerate(src.tolist()):
        a_, b_ = n - n_dup + i, s
        va, vb = base[a_].astype(np.float64), base[b_].astype(np.float64)
        cos = va @ vb / max(la.norm(va) * la.norm(vb), 1e-12)
        if cos >= tau:
            planted += 1
            if (min(a_, b_), max(a_, b_)) in found:
                planted_hit += 1
    return {
        "metric": "emb_dedup_vecs_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "vecs/sec",
        "n": n,
        "dims": dims,
        "tau": tau,
        "elapsed_sec": round(elapsed, 2),
        "verified_pairs": n_pairs,
        "planted_recall": round(planted_hit / max(planted, 1), 4),
        "n_planted": planted,
        "num_cpus": num_cpus,
    }


def run_substring(num_cpus: int, n_docs: int, seed: int) -> dict:
    """Substring-dedup at scale: suffix-array + winnowing spans over the
    synthetic corpus, measuring docs/s plus detection of the corpus's
    planted >= 200-char injected substrings (either side of an injected
    pair may be the kept first occurrence)."""
    _init_ray(num_cpus)
    from elastiknn_ray.sources.synth import base_target, pages_dataset, role_of, url_of
    from elastiknn_ray.stages.hashing import doc_id_of_url, prepare_batch
    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    pages = pages_dataset(n_docs, seed, override_num_blocks=64)
    docs = pages.map_batches(prepare_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "text"]
    )
    t0 = time.perf_counter()
    # byte-budgeted partitioning with a small target blob and a 4x-CPUs
    # floor: per-byte SA cost grows superlinearly with blob size on this
    # host class (cache + allocation stalls), so many ~4 MB blobs beat few
    # big ones.  (The library default stays 256 MB — sized for real-cluster
    # workers where per-task overhead, not cache, is the binding constraint.)
    spans = substring_spans(
        docs,
        SubstringConfig(target_blob_bytes=4 << 20, min_partitions=4 * num_cpus),
    ).materialize()
    elapsed = time.perf_counter() - t0
    flagged = set()
    for b in spans.iter_batches(batch_format="pyarrow"):
        flagged.update(b.column("doc_id").to_pylist())
    n_hosts = max(4, n_docs // 50)
    substr_rows = [i for i in range(n_docs) if role_of(i, seed) == "substr"]
    hit = 0
    for i in substr_rows:
        did = doc_id_of_url(url_of(i, seed, n_hosts))
        donor = doc_id_of_url(url_of(base_target(i, seed), seed, n_hosts))
        if did in flagged or donor in flagged:
            hit += 1
    return {
        "metric": "substring_docs_per_sec",
        "value": round(n_docs / elapsed, 1),
        "unit": "docs/sec",
        "n_docs": n_docs,
        "elapsed_sec": round(elapsed, 2),
        "span_rows": spans.count(),
        "injected_detected": hit,
        "injected_total": len(substr_rows),
        "detection_rate": round(hit / max(len(substr_rows), 1), 4),
        "num_cpus": num_cpus,
    }


def run_decisions(num_cpus: int, n_docs: int, seed: int) -> dict:
    """End-product scale point: the CHECKPOINTED keep/drop decision pipeline
    (exact + near + substring → one decision per doc) over a synthetic
    n_docs corpus written to Parquet first, reporting per-stage lineage
    timings from the manifests and manifest coverage (every stage must
    leave a MANIFEST.json — the resumability contract)."""
    _init_ray(num_cpus)
    import json as _json
    import os
    import shutil

    from elastiknn_ray.pipelines.queries import DOCS_DEDUP_CFG
    from elastiknn_ray.sources.synth import pages_dataset
    from elastiknn_ray.stages.substring import SubstringConfig
    from elastiknn_ray.state.checkpoint import checkpointed_dedup_decisions

    pages_path = f"/tmp/bench_pages_{n_docs}_{seed}"
    if not os.path.exists(os.path.join(pages_path, "_DONE")):
        shutil.rmtree(pages_path, ignore_errors=True)
        pages_dataset(n_docs, seed, override_num_blocks=64).write_parquet(pages_path)
        open(os.path.join(pages_path, "_DONE"), "w").write("ok")
    root = f"/tmp/bench_ckpt_{n_docs}_{seed}"
    shutil.rmtree(root, ignore_errors=True)  # cold run: no resume credit
    t0 = time.perf_counter()
    decisions, runner = checkpointed_dedup_decisions(
        pages_path,
        DOCS_DEDUP_CFG,
        root,
        # min_partitions is FIXED across parallelism levels: the intra-path
        # span EXTENTS (not detection — the window path is partition-
        # agnostic) depend on which doc pairs are co-partitioned, so the
        # partition count is a property of the PLAN (byte-budgeted from data
        # size), never of the cluster size.  A CPU-derived floor here made
        # the 8- and 32-CPU levels run different plans, and docs whose span
        # coverage sits near the substring_frac boundary flipped between
        # exact-extent and window-granular coverage (observed: 144 vs 141
        # substring drops at 60k docs).  128 = the byte-budget floor the
        # 32-CPU level always resolved to.
        sub_cfg=SubstringConfig(target_blob_bytes=4 << 20, min_partitions=128),
        num_partitions=16,
    )
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    keep = drop = 0
    reasons: dict = {}
    for b in decisions.iter_batches(batch_format="pyarrow"):
        k = int(pc.sum(pc.cast(b.column("keep"), pa.int64())).as_py() or 0)
        keep += k
        drop += b.num_rows - k
        for r, c in zip(*np.unique(b.column("reason").to_numpy(zero_copy_only=False), return_counts=True)):
            reasons[str(r)] = reasons.get(str(r), 0) + int(c)
    elapsed = time.perf_counter() - t0
    stages = runner.metrics()
    covered = [
        s
        for s in os.listdir(root)
        if os.path.isfile(os.path.join(root, s, "MANIFEST.json"))
    ]
    return {
        "metric": "decisions_docs_per_sec",
        "value": round(n_docs / elapsed, 1),
        "unit": "docs/sec",
        "n_docs": n_docs,
        "elapsed_sec": round(elapsed, 2),
        "keep": keep,
        "drop": drop,
        "reasons": reasons,
        "stages": stages,
        "manifest_stages": sorted(covered),
        "manifest_coverage": len(covered),
        "num_cpus": num_cpus,
    }


def run_scaling(repeats: int = 2) -> dict:
    """Fresh subprocess per parallelism level (clean Ray session, cold plan).

    Each level runs ``repeats`` times and the FASTEST run is kept — the
    standard noise-floor estimate: this sandbox shows ±20% wall-time jitter
    on high-parallelism runs (shared-host contention), while the computed
    work per run is identical (verified by matching pair/cluster counts).
    """
    runs = {}
    for cpus in (8, 32):
        best = None
        for _ in range(repeats):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--flagship",
                    "--cpus",
                    str(cpus),
                    "--docs",
                    str(SCALING_DOCS),
                ],
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["elapsed_sec"] < best["elapsed_sec"]:
                best = r
        runs[cpus] = best
    t8, t32 = runs[8]["elapsed_sec"], runs[32]["elapsed_sec"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": SCALING_DOCS,
        "run_8cpus": runs[8],
        "run_32cpus": runs[32],
        "speedup": round(t8 / t32, 2),
        "pass": eff >= 0.8,
    }


def run_scaling_decisions(n_docs: int, repeats: int = 2) -> dict:
    """North-rule scaling evidence for the END PRODUCT (the checkpointed
    exact+near+substring decision pipeline), same fresh-subprocess two-level
    protocol as ``run_scaling``.  Each run uses a COLD checkpoint root (the
    subprocess wipes it), so both levels do identical full work; identical
    keep/drop/reason counts across levels verify that."""
    runs = {}
    for cpus in (8, 32):
        best = None
        for _ in range(repeats):
            out = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--decisions",
                    "--cpus",
                    str(cpus),
                    "--docs",
                    str(n_docs),
                ],
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["elapsed_sec"] < best["elapsed_sec"]:
                best = r
        runs[cpus] = best
    if runs[8]["reasons"] != runs[32]["reasons"]:
        raise AssertionError(
            f"decision outputs differ across levels: {runs[8]['reasons']} "
            f"vs {runs[32]['reasons']}"
        )
    t8, t32 = runs[8]["elapsed_sec"], runs[32]["elapsed_sec"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "decisions_scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "run_8cpus": runs[8],
        "run_32cpus": runs[32],
        "speedup": round(t8 / t32, 2),
        "pass": eff >= 0.8,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--recall", action="store_true", help="dup-pair recall vs ground truth")
    ap.add_argument("--ann", action="store_true", help="ann-benchmarks-style recall/QPS sweep")
    ap.add_argument("--ann-jaccard", action="store_true", help="sparse Jaccard read-path recall/QPS sweep")
    ap.add_argument("--ann-l2", action="store_true", help="L2 multiprobe read-path sweep at the reference's published config shape")
    ap.add_argument("--flagship", action="store_true", help="single fresh-session flagship run")
    ap.add_argument("--emb-dedup", action="store_true", help="embedding near-dup scale run")
    ap.add_argument("--substring", action="store_true", help="substring-dedup scale run")
    ap.add_argument("--decisions", action="store_true", help="checkpointed keep/drop decisions scale run")
    ap.add_argument("--scaling-decisions", action="store_true", help="two-level scaling run of the decisions end product")
    ap.add_argument("--n", type=int, default=200_000, help="vector count for --emb-dedup")
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--docs", type=int, default=SCALING_DOCS)
    ap.add_argument("--repeats", type=int, default=None, help="best-of-N per registry entry")
    args = ap.parse_args()

    if args.scaling:
        result = run_scaling()
    elif args.recall:
        result = run_recall(args.cpus, args.docs, SCALING_SEED)
    elif args.ann:
        result = run_ann(args.cpus)
    elif args.ann_jaccard:
        result = run_ann_jaccard(args.cpus)
    elif args.ann_l2:
        result = run_ann_l2(args.cpus)
    elif args.flagship:
        result = run_flagship(args.cpus, args.docs, SCALING_SEED)
    elif args.emb_dedup:
        result = run_emb_dedup(args.cpus, args.n)
    elif args.substring:
        result = run_substring(args.cpus, args.docs, SCALING_SEED)
    elif args.scaling_decisions:
        result = run_scaling_decisions(args.docs)
    elif args.decisions:
        result = run_decisions(args.cpus, args.docs, SCALING_SEED)
    else:
        result = run_queries(SF_DIR, args.cpus, args.repeats)

    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()

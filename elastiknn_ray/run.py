"""Job entry point for the flagship near-dup pipeline — the ``ray job
submit`` surface of the north rule::

    ray job submit --working-dir . -- python -m elastiknn_ray.run \
        --input /data/pages --output /data/out --checkpoint-root /data/ckpt \
        --shingle-k 5 --lsh-l 64 --lsh-k 3 --tau 0.5

Runs the checkpointed pipeline (state/checkpoint.py): each stage writes
partitioned Parquet + a lineage MANIFEST, so re-submitting the same job
resumes at the first incomplete stage.  Prints one JSON line of per-stage
metrics (rows, wall seconds, skipped-from-checkpoint) and writes the final
cluster table to ``--output``.

This script OWNS its Ray session (``__ray_entry__.py``/library code never
call ray.init — driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="Parquet dir/file of pages (url, warc_ts, html, text, lang) or (doc_id, text)")
    ap.add_argument("--output", required=True, help="output dir for the cluster-assignment Parquet")
    ap.add_argument("--checkpoint-root", required=True)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--lsh-l", type=int, default=64)
    ap.add_argument("--lsh-k", type=int, default=3)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--hot-band-cap", type=int, default=256)
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument(
        "--mode",
        choices=["clusters", "decisions"],
        default="clusters",
        help="clusters: near-dup cluster table; decisions: full keep/drop "
        "decision table (exact + near + substring)",
    )
    ap.add_argument("--substring-frac", type=float, default=0.5)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig
    from elastiknn_ray.state.checkpoint import (
        checkpointed_dedup_decisions,
        checkpointed_near_dup,
    )

    cfg = DedupConfig(
        shingle=ShingleConfig(k=args.shingle_k),
        lsh=JaccardLshConfig(L=args.lsh_l, k=args.lsh_k, seed=0),
        tau=args.tau,
        hot_band_cap=args.hot_band_cap,
    )
    t0 = time.perf_counter()
    if args.mode == "decisions":
        result, runner = checkpointed_dedup_decisions(
            args.input,
            cfg,
            args.checkpoint_root,
            substring_frac=args.substring_frac,
            num_partitions=args.num_partitions,
        )
    else:
        result, runner = checkpointed_near_dup(
            args.input, cfg, args.checkpoint_root, num_partitions=args.num_partitions
        )
    os.makedirs(args.output, exist_ok=True)
    result.write_parquet(args.output)
    print(
        json.dumps(
            {
                "elapsed_sec": round(time.perf_counter() - t0, 3),
                "stages": runner.metrics(),
                "output": args.output,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

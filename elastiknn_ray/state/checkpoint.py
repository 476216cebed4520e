"""Per-stage checkpointing with lineage manifests (SURVEY.md §2.5 N6; the
north rule's "checkpointed resumability after any stage with per-partition
lineage manifests").

Layout under a run root::

    {root}/{stage}/part-*.parquet     partitioned stage output
    {root}/{stage}/MANIFEST.json      digest + per-file lineage + metrics

A stage's digest = blake2(stage name, its config repr, its upstream
digests) — purely structural, so a rerun with identical code+config+inputs
skips every completed stage (read back from Parquet), while any config or
upstream change invalidates exactly the affected suffix of the DAG.  A
killed run leaves a stage directory without MANIFEST.json; the next run
recomputes that stage (writes are not atomic, the manifest is the commit
record).

Never one giant file: output keeps its block partitioning, and the manifest
records per-file row counts + sizes (the per-partition lineage).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field


def _digest(*parts: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()


def input_fingerprint(path: str) -> str:
    """Content-identity fingerprint of an input path: sorted (relpath, size,
    mtime_ns) of every file under it.  Folded into the ROOT stage's digest
    so regenerated input files invalidate the whole DAG instead of silently
    reusing stale checkpoints (cheap: metadata only, no data reads)."""
    parts = []
    if os.path.isfile(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    else:
        for dirpath, _, files in os.walk(path):
            for f in files:
                fp = os.path.join(dirpath, f)
                st = os.stat(fp)
                parts.append(
                    f"{os.path.relpath(fp, path)}:{st.st_size}:{st.st_mtime_ns}"
                )
    return _digest(*sorted(parts))


@dataclass
class StageResult:
    name: str
    digest: str
    path: str
    rows: int
    skipped: bool  # True when restored from an existing checkpoint
    wall_s: float


@dataclass
class CheckpointRunner:
    """Runs named stages with skip-if-complete semantics.

    >>> runner = CheckpointRunner("/tmp/run1")
    >>> sigs = runner.stage("signatures", cfg_repr, [], lambda: sig_ds)
    """

    root: str
    results: dict[str, StageResult] = field(default_factory=dict)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, name, "MANIFEST.json")

    def stage(self, name: str, config_repr: str, deps: list[str], build):
        """Return the stage's Dataset, computing + persisting it unless a
        manifest with a matching digest already exists.

        ``build`` is a zero-arg callable returning the stage's Dataset;
        ``deps`` are upstream stage names already run through this runner.
        """
        import ray.data as rd

        dep_digests = [self.results[d].digest for d in deps]
        digest = _digest(name, config_repr, *dep_digests)
        out_dir = os.path.join(self.root, name)
        mpath = self._manifest_path(name)

        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("digest") == digest:
                ds = rd.read_parquet(out_dir, file_extensions=["parquet"])
                self.results[name] = StageResult(
                    name, digest, out_dir, manifest["rows"], True,
                    manifest.get("wall_s", 0.0),
                )
                return ds

        # stale or absent -> recompute (remove partial/old output first)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.perf_counter()
        ds = build()
        ds.write_parquet(out_dir)
        wall = time.perf_counter() - t0

        files = sorted(
            f for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        import pyarrow.parquet as pq

        lineage = []
        total_rows = 0
        for f in files:
            fp = os.path.join(out_dir, f)
            md = pq.read_metadata(fp)
            lineage.append(
                {"file": f, "rows": md.num_rows, "bytes": os.path.getsize(fp)}
            )
            total_rows += md.num_rows
        manifest = {
            "stage": name,
            "digest": digest,
            "config": config_repr,
            "deps": {d: self.results[d].digest for d in deps},
            "rows": total_rows,
            "wall_s": round(wall, 3),
            "partitions": lineage,
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(mpath + ".tmp", mpath)  # manifest write is the commit
        self.results[name] = StageResult(
            name, digest, out_dir, total_rows, False, wall
        )
        return rd.read_parquet(out_dir, file_extensions=["parquet"])

    def metrics(self) -> dict:
        return {
            n: {"rows": r.rows, "skipped": r.skipped, "wall_s": round(r.wall_s, 3)}
            for n, r in self.results.items()
        }


def _empty_ids():
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))


def checkpointed_near_dup(pages_path: str, cfg, root: str, *, num_partitions: int = 16):
    """The flagship pipeline with a checkpoint after every stage: any rerun
    with the same config resumes at the first incomplete stage.

    Stage DAG: signatures → candidates → verified → clusters.
    Returns (clusters Dataset, runner) — runner.metrics() has the per-stage
    lineage/throughput record.
    """
    import ray.data as rd

    from elastiknn_ray.stages.components import connected_components
    from elastiknn_ray.stages.hashing import (
        SignatureStage,
        minhash_bands_fn,
        prepare_batch,
    )
    from elastiknn_ray.stages.pairs import candidate_pairs
    from elastiknn_ray.stages.verify import verify_pairs

    runner = CheckpointRunner(root)
    os.makedirs(root, exist_ok=True)

    # per-stage config scope (only fields the stage actually reads) so e.g.
    # a tau change re-runs ONLY verify onwards; the root stage additionally
    # fingerprints the input files so regenerated data invalidates the DAG
    sigs = runner.stage(
        "signatures",
        repr(cfg.shingle) + pages_path + input_fingerprint(pages_path),
        [],
        lambda: rd.read_parquet(pages_path)
        .map_batches(prepare_batch, batch_format="pyarrow")
        .map_batches(
            SignatureStage(cfg.shingle), batch_format="pyarrow", batch_size=1024
        ),
    )

    cands = runner.stage(
        "candidates",
        repr(cfg.lsh) + f":cap={cfg.hot_band_cap}",
        ["signatures"],
        lambda: candidate_pairs(
            sigs.map_batches(
                minhash_bands_fn,
                fn_kwargs={"lsh": cfg.lsh},
                batch_format="pyarrow",
                batch_size=1024,
            ),
            cfg.hot_band_cap,
        ),
    )

    verified = runner.stage(
        "verified",
        f"tau={cfg.tau}",
        ["signatures", "candidates"],
        lambda: verify_pairs(cands, sigs, cfg.tau, num_partitions=num_partitions),
    )

    clusters = runner.stage(
        "clusters",
        "",
        ["verified"],
        lambda: connected_components(
            verified.select_columns(["doc_a", "doc_b"]).rename_columns(
                {"doc_a": "u", "doc_b": "v"}
            )
        ),
    )
    return clusters, runner


def checkpointed_dedup_decisions(
    pages_path: str,
    cfg,
    root: str,
    *,
    sub_cfg=None,
    substring_frac: float = 0.5,
    num_partitions: int = 16,
):
    """The full end-product pipeline (exact + near + substring → keep/drop
    decision per doc) with a checkpoint after EVERY stage: signatures →
    candidates → verified → clusters → spans → decisions.  Any rerun with
    the same config + input resumes at the first incomplete stage; a tau
    change replays verify onwards, a substring-config change replays only
    spans + decisions.

    Returns (decisions Dataset, runner).
    """
    import ray.data as rd

    from elastiknn_ray.pipelines.decide import (
        _drop_exact,
        _without_ids,
        decisions_from,
    )
    from elastiknn_ray.stages.hashing import prepare_batch
    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    sub_cfg = sub_cfg or SubstringConfig(num_partitions=num_partitions)
    clusters, runner = checkpointed_near_dup(
        pages_path, cfg, root, num_partitions=num_partitions
    )

    def docs_ds():
        return (
            rd.read_parquet(pages_path)
            .map_batches(prepare_batch, batch_format="pyarrow")
            .select_columns(["doc_id", "text"])
        )

    src = pages_path + input_fingerprint(pages_path)
    exact_drops = runner.stage(
        "exact",
        src,
        [],
        lambda: _drop_exact(docs_ds()),
    )
    n_exact = runner.results["exact"].rows
    # span corpus excludes exact-dup docs: their decision is "exact"
    # regardless and their min-id representative carries identical text, so
    # no span content is lost — the suffix-array stage just stops paying
    # for verbatim clones.
    spans = runner.stage(
        "spans",
        repr(sub_cfg) + src,
        ["exact"],
        lambda: substring_spans(
            _without_ids(docs_ds(), exact_drops, n_exact, num_partitions),
            sub_cfg,
        ),
    )
    decisions = runner.stage(
        "decisions",
        f"frac={substring_frac}",
        ["exact", "clusters", "spans"],
        lambda: decisions_from(
            docs_ds().materialize(),
            clusters,
            spans,
            substring_frac=substring_frac,
            num_partitions=num_partitions,
            # a 0-row checkpoint read-back can be schema-less; substitute a
            # typed empty so downstream projections keep their schema
            exact_drops=exact_drops if n_exact else _empty_ids(),
        ),
    )
    return decisions, runner

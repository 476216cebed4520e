"""Checkpoint/lineage tests (M8): skip-if-complete, invalidation on config
change, recovery from a missing manifest, per-partition lineage records."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig


@pytest.fixture()
def pages_path(tmp_path, ray_session):
    import pyarrow.parquet as pqw

    from elastiknn_ray.sources.synth import pages_table

    p = str(tmp_path / "pages.parquet")
    pqw.write_table(pages_table(200, 7), p)
    return p


CFG = DedupConfig(
    shingle=ShingleConfig(k=5), lsh=JaccardLshConfig(L=64, k=3, seed=0), tau=0.5
)


def test_checkpoint_run_and_resume(ray_session, pages_path, tmp_path):
    from elastiknn_ray.state.checkpoint import checkpointed_near_dup

    root = str(tmp_path / "run")
    clusters1, r1 = checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    df1 = clusters1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert all(not s.skipped for s in r1.results.values())
    assert len(df1) > 0

    # second run: every stage restored from checkpoint, identical output
    clusters2, r2 = checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    df2 = clusters2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert all(s.skipped for s in r2.results.values())
    import pandas as pd

    pd.testing.assert_frame_equal(df1, df2)

    # manifests carry per-partition lineage and row counts
    with open(os.path.join(root, "signatures", "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["rows"] == 200
    assert m["partitions"] and all("rows" in p for p in m["partitions"])
    assert sum(p["rows"] for p in m["partitions"]) == m["rows"]


def test_checkpoint_resumes_after_partial_failure(ray_session, pages_path, tmp_path):
    from elastiknn_ray.state.checkpoint import checkpointed_near_dup

    root = str(tmp_path / "run")
    _, r1 = checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)

    # simulate a crash mid-"verified": manifest gone, dir partially written
    os.remove(os.path.join(root, "verified", "MANIFEST.json"))
    clusters, r2 = checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    assert r2.results["signatures"].skipped
    assert r2.results["candidates"].skipped
    assert not r2.results["verified"].skipped  # recomputed
    # clusters' digest is structural (depends on verified's digest, not its
    # bytes); the recompute is deterministic, so restoring clusters is valid
    assert r2.results["clusters"].skipped
    assert clusters.count() == r1.results["clusters"].rows


def test_checkpoint_invalidates_on_config_change(ray_session, pages_path, tmp_path):
    from elastiknn_ray.state.checkpoint import checkpointed_near_dup

    root = str(tmp_path / "run")
    checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    cfg2 = DedupConfig(
        shingle=ShingleConfig(k=5), lsh=JaccardLshConfig(L=64, k=3, seed=0), tau=0.6
    )
    _, r2 = checkpointed_near_dup(pages_path, cfg2, root, num_partitions=4)
    # per-stage config scope: a tau change re-runs ONLY verify onwards
    assert r2.results["signatures"].skipped
    assert r2.results["candidates"].skipped
    assert not r2.results["verified"].skipped
    assert not r2.results["clusters"].skipped


def test_checkpoint_invalidates_on_input_change(ray_session, pages_path, tmp_path):
    """Regenerated input files (new mtime/size) must invalidate the whole
    DAG — stale checkpoints are never silently reused (ADVICE fix)."""
    import pyarrow.parquet as pqw

    from elastiknn_ray.sources.synth import pages_table
    from elastiknn_ray.state.checkpoint import checkpointed_near_dup

    root = str(tmp_path / "run")
    checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    # rewrite the input with different content
    pqw.write_table(pages_table(210, 8), pages_path)
    _, r2 = checkpointed_near_dup(pages_path, CFG, root, num_partitions=4)
    assert all(not s.skipped for s in r2.results.values())


def test_checkpointed_dedup_decisions_resume(ray_session, pages_path, tmp_path):
    """The full end-product pipeline checkpoints all six stages; killing the
    spans manifest replays only spans + decisions; outputs identical and
    equal to the live (uncheckpointed) dedup_decisions."""
    import pandas as pd
    import ray.data as rd

    from elastiknn_ray.pipelines.decide import dedup_decisions
    from elastiknn_ray.stages.hashing import prepare_batch
    from elastiknn_ray.state.checkpoint import checkpointed_dedup_decisions

    root = str(tmp_path / "run")
    dec1, r1 = checkpointed_dedup_decisions(pages_path, CFG, root, num_partitions=4)
    df1 = dec1.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(r1.results) == {
        "signatures", "candidates", "verified", "clusters",
        "exact", "spans", "decisions",
    }

    # live-pipeline equivalence
    docs = rd.read_parquet(pages_path).map_batches(
        prepare_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "text"])
    live = dedup_decisions(docs, CFG, num_partitions=4).to_pandas()
    live = live.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        df1[["doc_id", "keep", "reason"]], live[["doc_id", "keep", "reason"]]
    )

    # crash mid-spans: only spans + decisions recompute
    os.remove(os.path.join(root, "spans", "MANIFEST.json"))
    dec2, r2 = checkpointed_dedup_decisions(pages_path, CFG, root, num_partitions=4)
    assert r2.results["signatures"].skipped
    assert r2.results["clusters"].skipped
    assert r2.results["exact"].skipped
    assert not r2.results["spans"].skipped  # recomputed
    # decisions' digest is structural (depends on spans' digest, not its
    # bytes); the recompute is deterministic, so restoring it is valid
    assert r2.results["decisions"].skipped
    df2 = dec2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df1, df2)

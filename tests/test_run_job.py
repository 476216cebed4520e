"""Smoke test of the ``ray job submit`` entry point (elastiknn_ray/run.py):
drive it as a real subprocess (it owns its own Ray session — isolated from
the pytest fixture's), check the single-JSON-line metrics contract, the
cluster-table output, and checkpoint resume on re-submit."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq


def test_job_entry_runs_and_resumes(tmp_path):
    import ray

    from elastiknn_ray.sources.synth import pages_dataset

    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # write a small input corpus from the session fixture's Ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    pages_dataset(800, seed=3, override_num_blocks=4).write_parquet(pages)

    env = dict(os.environ, RAY_ADDRESS="local")
    cmd = [
        sys.executable, "-m", "elastiknn_ray.run",
        "--input", pages, "--output", out, "--checkpoint-root", ckpt,
        "--num-partitions", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, check=True,
                        cwd=os.path.dirname(os.path.dirname(__file__)), env=env)
    m1 = json.loads(r1.stdout.strip().splitlines()[-1])  # ONE JSON line
    assert set(m1["stages"]) >= {"signatures", "candidates", "verified", "clusters"}
    assert not any(s["skipped"] for s in m1["stages"].values())
    t = pq.read_table(out)
    assert {"doc_id", "cluster_id"} <= set(t.schema.names)
    assert t.num_rows > 0

    # re-submit: every stage restores from its manifest, output identical
    out2 = str(tmp_path / "out2")
    r2 = subprocess.run(cmd[:6] + [out2] + cmd[7:], capture_output=True,
                        text=True, check=True,
                        cwd=os.path.dirname(os.path.dirname(__file__)), env=env)
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert all(s["skipped"] for s in m2["stages"].values()), m2["stages"]
    t2 = pq.read_table(out2)
    a = t.to_pandas().sort_values(["doc_id"]).reset_index(drop=True)
    b = t2.to_pandas().sort_values(["doc_id"]).reset_index(drop=True)
    assert a.equals(b)

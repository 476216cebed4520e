"""End-to-end near-dup pipeline: dup-pair recall vs brute-force ground truth
(the north rule's >=0.99 acceptance at the operating config), precision-by-
construction (exact verification), determinism under repartitioning, and
cluster correctness (SURVEY.md §5 "our port of this strategy")."""

import numpy as np
import pytest

from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig
from elastiknn_ray.sources import synth
from elastiknn_ray.text.shingle import shingle_batch

N_DOCS = 600
SEED = 42
CFG = DedupConfig(
    shingle=ShingleConfig(k=5),
    lsh=JaccardLshConfig(L=16, k=4, seed=0),
    tau=0.8,
    hot_band_cap=64,
)
# At J=tau=0.8, P[candidate] = 1-(1-J^k)^L = 1-(1-0.41)^16 ≈ 0.9998 >= 0.99.


def _exact_dup_pairs(texts, doc_ids, cfg):
    """Brute-force oracle: all pairs with exact shingle-Jaccard >= tau, via a
    driver-side inverted index (complete for tau > 0)."""
    offsets, values = shingle_batch(texts, cfg.shingle)
    sets = [
        frozenset(values[offsets[i] : offsets[i + 1]].tolist())
        for i in range(len(texts))
    ]
    inv = {}
    for i, s in enumerate(sets):
        for sh in s:
            inv.setdefault(sh, []).append(i)
    cand = set()
    for docs in inv.values():
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                cand.add((docs[ai], docs[bi]))
    # empty docs are mutual duplicates (0/0-Jaccard = 1, ExactModel.java:13)
    empties = [i for i, s in enumerate(sets) if not s]
    for ai in range(len(empties)):
        for bi in range(ai + 1, len(empties)):
            cand.add((empties[ai], empties[bi]))
    out = {}
    for a, b in cand:
        sa, sb = sets[a], sets[b]
        isec = len(sa & sb)
        denom = len(sa) + len(sb) - isec
        j = 1.0 if denom == 0 else isec / denom
        if j >= cfg.tau:
            key = tuple(sorted((doc_ids[a], doc_ids[b])))
            out[key] = j
    return out


@pytest.fixture(scope="module")
def pipeline_result(ray_session):
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline
    from elastiknn_ray.stages.hashing import doc_id_of_url

    pages = synth.pages_table(N_DOCS, SEED)
    ds = rd.from_arrow(pages).repartition(6)
    res = near_dup_pipeline(ds, CFG, num_partitions=4)
    pairs = res.pairs.to_pandas()
    clusters = res.clusters.to_pandas()
    doc_ids = [doc_id_of_url(u) for u in pages.column("url").to_pylist()]
    truth = _exact_dup_pairs(pages.column("text").to_pylist(), doc_ids, CFG)
    return pages, doc_ids, pairs, clusters, truth


def test_dup_pair_recall_ge_099(pipeline_result):
    _, _, pairs, _, truth = pipeline_result
    found = {
        tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    }
    assert len(truth) > 20, "fixture must contain real dup pairs"
    hit = sum(1 for p in truth if p in found)
    recall = hit / len(truth)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99 ({hit}/{len(truth)})"


def test_verified_pairs_precision_exact(pipeline_result):
    """Every emitted pair must truly have exact Jaccard >= tau — precision is
    1.0 by construction (exact re-scoring, HashingQuery.scala:23-38) — and
    the reported jaccard must match the oracle value."""
    _, _, pairs, _, truth = pipeline_result
    for a, b, j in zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"]):
        key = tuple(sorted((int(a), int(b))))
        assert key in truth, f"false positive pair {key}"
        assert abs(truth[key] - j) < 1e-9


def test_clusters_match_oracle_components(pipeline_result):
    from tests.test_components import _oracle_components

    _, _, _, clusters, truth = pipeline_result
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    # oracle components over the TRUE dup-pair graph restricted to found pairs
    # = components over verified pairs (recall test already bounds the gap)
    expect = _oracle_components(sorted(truth.keys()))
    agree = sum(1 for n, r in expect.items() if got.get(n, n) == r)
    assert agree / max(1, len(expect)) >= 0.99


def test_empty_docs_form_one_cluster(pipeline_result):
    pages, doc_ids, _, clusters, _ = pipeline_result
    texts = pages.column("text").to_pylist()
    empty_ids = sorted(doc_ids[i] for i, t in enumerate(texts) if t == "")
    if len(empty_ids) < 2:
        pytest.skip("fixture has <2 empty docs")
    got = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    labels = {got.get(d) for d in empty_ids}
    assert labels == {empty_ids[0]}


def test_pipeline_deterministic_across_partitioning(ray_session):
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    pages = synth.pages_table(250, 43)

    def run(nparts, njoin):
        ds = rd.from_arrow(pages).repartition(nparts)
        res = near_dup_pipeline(ds, CFG, num_partitions=njoin)
        p = res.pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        c = res.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return p, c

    p1, c1 = run(2, 4)
    p2, c2 = run(7, 3)
    assert p1.equals(p2)
    assert c1.equals(c2)


def test_hot_band_and_empty_sentinel_stress(ray_session):
    """Pathological skew: hundreds of IDENTICAL docs collide in every band
    (the universal hot band) and empty docs all hit the sentinel band.  The
    cap+star policy must keep pair volume bounded while union-find still
    recovers one full cluster per content group (SURVEY.md §4 hot-keys row;
    JaccardLshModel.java:37-38 empty-vector semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    n_same, n_empty, n_noise = 500, 50, 100
    rng = np.random.default_rng(3)
    same_text = " ".join(f"tok{i}" for i in range(60))
    noise = [
        " ".join(f"n{rng.integers(0, 10_000)}x{j}" for j in range(40))
        for _ in range(n_noise)
    ]
    texts = [same_text] * n_same + [""] * n_empty + noise
    ids = list(range(len(texts)))
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )
    ).repartition(6)

    cfg = DedupConfig(
        shingle=ShingleConfig(k=5),
        lsh=JaccardLshConfig(L=16, k=3, seed=0),
        tau=0.5,
        hot_band_cap=64,
    )
    res = near_dup_pipeline(docs, cfg, num_partitions=4)
    clusters = res.clusters.to_pandas()
    by_doc = clusters.set_index("doc_id")["cluster_id"]

    # all identical docs in ONE cluster labeled by the min doc id (0)
    same_labels = set(by_doc.loc[[i for i in range(n_same)]])
    assert same_labels == {0}
    # all empty docs cluster together (0/0-Jaccard = 1), separately from text
    empty_ids = list(range(n_same, n_same + n_empty))
    empty_labels = set(by_doc.loc[empty_ids])
    assert empty_labels == {n_same}
    # pair volume stayed bounded: star+cells, nowhere near g^2/2
    n_pairs = res.pairs.count()
    cap = cfg.hot_band_cap
    per_group_bound = (n_same // cap + 1) * (cap * (cap - 1) // 2) + n_same
    assert n_pairs < 2 * (per_group_bound + n_empty * (n_empty - 1) // 2)


def test_spill_path_outputs_equal_in_memory_path(ray_session, monkeypatch, tmp_path):
    """Forcing the pin-or-spill gate onto its Parquet path (budget fraction
    ~0) must leave the flagship's pairs/clusters byte-identical to the
    in-memory materialize path."""
    import ray.data as rd

    import elastiknn_ray.pipelines.near_dup as nd
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    pages = synth.pages_table(300, 11)
    ds = rd.from_arrow(pages).repartition(5)

    res_mem = near_dup_pipeline(ds, CFG, num_partitions=4)
    mem_pairs = res_mem.pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    mem_clusters = res_mem.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)

    monkeypatch.setattr(nd, "PIN_BUDGET_FRAC", 0.0)
    monkeypatch.setenv("GRAFT_SPILL_DIR", str(tmp_path))
    res_disk = near_dup_pipeline(ds, CFG, num_partitions=4)
    disk_pairs = res_disk.pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    disk_clusters = res_disk.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(mem_pairs, disk_pairs)
    pd.testing.assert_frame_equal(mem_clusters, disk_clusters)
    # the spill actually happened: parquet landed under the override dir
    spilled = list(tmp_path.glob("elastiknn_spill_*"))
    assert spilled, "expected spill directories under GRAFT_SPILL_DIR"

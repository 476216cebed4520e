"""End-to-end flows from the verify recipe (.claude/skills/verify): html-only
input, duplicate-free corpora, and tau=1.0 — the edge configurations a user
hits first."""

import numpy as np
import pyarrow as pa


def _pipeline(pages, tau=0.5):
    from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    cfg = DedupConfig(
        shingle=ShingleConfig(k=5),
        lsh=JaccardLshConfig(L=64, k=3, seed=0),
        tau=tau,
    )
    return near_dup_pipeline(pages, cfg, num_partitions=4)


def test_html_only_input_extracts_text(ray_session):
    """Dropping the text column forces the html -> text extraction path;
    results must match the with-text run byte-for-byte (the extractor is the
    same function the synthetic source used to fill text)."""
    import ray.data as rd

    from elastiknn_ray.sources.synth import pages_table

    t = pages_table(200, 7)
    with_text = rd.from_arrow(t)
    html_only = rd.from_arrow(t.drop_columns(["text"]))
    a = _pipeline(with_text).pairs.to_pandas()
    b = _pipeline(html_only).pairs.to_pandas()

    def canon(df):
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)[
            ["doc_a", "doc_b"]
        ]

    assert len(a) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(canon(a), canon(b))


def test_duplicate_free_corpus_yields_empty_results(ray_session):
    """A corpus with no duplicates must return empty pairs/clusters without
    crashing (empty datasets lose schemas through shuffles)."""
    import ray.data as rd

    rng = np.random.default_rng(3)

    def rand_text(n):
        # long random word soup: no shared 5-shingles between docs
        words = ["w%06d" % w for w in rng.integers(0, 1_000_000, n)]
        return " ".join(words)

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(50, dtype=np.int64), pa.int64()),
                "text": pa.array([rand_text(80) for _ in range(50)], pa.string()),
            }
        )
    )
    res = _pipeline(docs)
    assert res.pairs.count() == 0
    assert res.clusters.count() == 0


def test_tau_one_keeps_only_exact_clones(ray_session):
    """tau=1.0: only byte-identical shingle sets survive the verify — near
    duplicates (one word changed) must NOT pair."""
    import ray.data as rd

    rng = np.random.default_rng(4)
    base_words = ["w%05d" % w for w in rng.integers(0, 99999, 120)]
    base = " ".join(base_words)
    near = " ".join(base_words[:-1] + ["zzchanged"])
    texts = [base, base, near] + [
        " ".join("q%05d" % w for w in rng.integers(0, 99999, 100))
        for _ in range(20)
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    pairs = _pipeline(docs, tau=1.0).pairs.to_pandas()
    got = {(min(a, b), max(a, b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert got == {(0, 1)}, got  # the exact clone pair only

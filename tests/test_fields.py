"""Multi-field corpus: per-field mappings, plan-time validation, codecs,
and the term-filter mask (VectorMapper.scala:125-131 semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from elastiknn_ray.config import ShingleConfig
from elastiknn_ray.stages.fields import (
    DenseFloatMapping,
    MultiFieldCorpus,
    SparseBoolMapping,
    decode_f32_matrix,
    encode_f32_vectors,
)


def _corpus(ds=None):
    return MultiFieldCorpus(
        ds,
        {
            "title_sig": SparseBoolMapping(shingle=ShingleConfig(k=2)),
            "body_emb": DenseFloatMapping(dims=16),
        },
    )


def test_unknown_field_raises_at_plan_time():
    c = _corpus()
    with pytest.raises(ValueError, match="unknown vector field"):
        c.mapping("nope")
    with pytest.raises(ValueError, match="unknown vector field"):
        c.knn_dense("nope", {"ids": [], "matrix": np.zeros((0, 16))}, k=5)


def test_kind_mismatch_raises_at_plan_time():
    c = _corpus()
    with pytest.raises(ValueError, match="not dense_float"):
        c.knn_dense("title_sig", {"ids": [], "matrix": np.zeros((0, 16))}, k=5)
    with pytest.raises(ValueError, match="not sparse_bool"):
        c.sparse_term_mask("body_emb", "a b")


def test_dims_mismatch_raises_at_plan_time():
    c = _corpus()
    with pytest.raises(ValueError, match="do not match field 'body_emb' mapping"):
        c.knn_dense("body_emb", {"ids": [0], "matrix": np.zeros((1, 8))}, k=5)


def test_term_probe_shingle_count_validated():
    c = _corpus()
    with pytest.raises(ValueError, match="term filters need exactly 1"):
        c.sparse_term_mask("title_sig", "one two three")


def test_f32_codec_roundtrip():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(7, 16)).astype(np.float32)
    col = pa.array([row.tolist() for row in m], pa.list_(pa.float32()))
    blob = encode_f32_vectors(col)
    back = decode_f32_matrix(blob, 16)
    np.testing.assert_array_equal(back, m.astype(np.float64))
    # sliced column keeps alignment
    back2 = decode_f32_matrix(blob.slice(2, 3), 16)
    np.testing.assert_array_equal(back2, m[2:5].astype(np.float64))


def test_sparse_term_mask_hits():
    from elastiknn_ray.stages.hashing import SignatureStage

    cfg = ShingleConfig(k=2)
    texts = ["alpha beta gamma", "beta gamma delta", "epsilon zeta"]
    sig = SignatureStage(cfg)(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    corpus_t = pa.table(
        {
            "doc_id": sig.column("doc_id"),
            "title_sig": sig.column("shingles"),
            "title_sig_n": sig.column("n_shingles"),
        }
    )
    c = MultiFieldCorpus(None, {"title_sig": SparseBoolMapping(shingle=cfg)})
    mask = c.sparse_term_mask("title_sig", "beta gamma")
    np.testing.assert_array_equal(mask(corpus_t), [True, True, False])
    mask2 = c.sparse_term_mask("title_sig", "alpha beta")
    np.testing.assert_array_equal(mask2(corpus_t), [True, False, False])


def test_multi_field_end_to_end(ray_session):
    """Corpus build joins the two fields; querying each field works and the
    outputs key by the same doc ids."""
    import ray.data as rd

    from elastiknn_ray.stages.fields import build_multi_field_corpus

    n, dims = 40, 8
    rng = np.random.default_rng(1)
    words = ["red", "green", "blue", "cyan", "pink", "gold"]
    texts = [
        " ".join(rng.choice(words, size=10).tolist()) for _ in range(n)
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    )
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    rng.normal(size=(n, dims)).astype(np.float32).tolist(),
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    corpus = build_multi_field_corpus(
        docs, emb, title_words=8, title_shingle=ShingleConfig(k=2), dims=dims
    )
    sparse = corpus.knn_sparse("title_sig", np.arange(3), k=3).to_pandas()
    assert set(sparse.query_id) <= {0, 1, 2}
    assert (sparse.query_id != sparse.neighbor_id).all()

    q = {"ids": np.arange(2), "matrix": rng.normal(size=(2, dims))}
    dense = corpus.knn_dense("body_emb", q, k=3).to_pandas()
    assert sorted(dense.query_id.unique()) == [0, 1]
    assert len(dense) == 6


def test_doc_missing_one_field_stays_searchable_on_the_other(ray_session):
    """Per-field missing-vector semantics (DocsWithMissingVectorsSuite
    applied to multi-field docs): a doc with no embedding row keeps its
    title field — title queries still see it, body queries never do."""
    import ray.data as rd

    from elastiknn_ray.stages.fields import build_multi_field_corpus

    n, dims = 60, 8
    rng = np.random.default_rng(5)
    words = ["red", "green", "blue", "cyan", "pink", "gold"]
    texts = [" ".join(rng.choice(words, size=10).tolist()) for i in range(n)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }
        )
    )
    m = rng.normal(size=(n, dims)).astype(np.float32)
    embedded = [i for i in range(n) if i % 3 != 0]  # every 3rd doc: no vector
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(embedded, pa.int64()),
                "embedding": pa.array(
                    m[embedded].tolist(), pa.list_(pa.float32())
                ),
            }
        )
    )
    corpus = build_multi_field_corpus(
        docs, emb, title_words=8, title_shingle=ShingleConfig(k=2), dims=dims
    )
    # every doc (incl. the vector-less every-3rd) is present with its title
    t = corpus.ds.materialize().to_pandas()
    assert len(t) == n
    assert t["body_emb"].isna().sum() == n - len(embedded)

    # title search sees a vector-less doc (query by its own title sig)
    title_hits = corpus.knn_sparse("title_sig", np.array([0, 3]), k=5).to_pandas()
    assert set(title_hits["query_id"]) == {0, 3}

    # body search: query with doc 1's own vector under a fresh id — the
    # identical stored doc tops at score 2.0, and NO vector-less doc appears
    body = corpus.knn_dense(
        "body_emb", {"ids": np.array([-1]), "matrix": m[[1]].astype(np.float64)}, k=8
    ).to_pandas()
    assert len(body) == 8
    assert (body["neighbor_id"] % 3 != 0).all()
    top = body.sort_values("score", ascending=False).iloc[0]
    assert int(top["neighbor_id"]) == 1
    np.testing.assert_allclose(top["score"], 2.0, atol=1e-9)


def test_title_top_bigram_ignores_edge_whitespace(ray_session, tmp_path):
    """ADVICE r4 (low): whitespace-padded titles must not shift the
    TITLE_WORDS window or admit empty-token bigrams into the DF counts —
    the probe must match the SQL oracle's drop-empty-token semantics."""
    import pyarrow.parquet as pq

    from elastiknn_ray.pipelines.queries import _title_top_bigram

    # every title is padded; pre-fix the splitter yielded ['', w1..w7] so
    # the top (df=3) bigram was ' w1' (an empty-token bigram, and 'w7 w8'
    # never entered the window).
    text = " w1 w2 w3 w4 w5 w6 w7 w8"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text, text, text + " tail"], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    top = _title_top_bigram(str(tmp_path))
    assert top == "w1 w2"

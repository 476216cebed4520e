"""JSONL source: parse fast/slow paths, dead-letter reasons, url-derived ids,
and the write/read round-trip (SURVEY.md §2.4 S1 JSON side)."""

import json
import os

import pyarrow as pa
import pytest

from elastiknn_ray.sources.jsonl import (
    dead_letter_docs,
    export_jsonl_corpus,
    parse_batch,
    read_jsonl_docs,
    valid_docs,
    write_jsonl,
)
from elastiknn_ray.stages.hashing import doc_id_of_url


def _batch(lines):
    return pa.table({"text": pa.array(lines, pa.string())})


def test_parse_fast_path_all_valid():
    lines = [
        json.dumps({"doc_id": i, "text": f"hello {i}", "lang": "en"})
        for i in range(10)
    ]
    out = parse_batch(_batch(lines), langs=("en",))
    assert out.column("reason").to_pylist() == [""] * 10
    assert out.column("doc_id").to_pylist() == list(range(10))


def test_parse_isolates_malformed_lines():
    good = json.dumps({"doc_id": 1, "text": "ok", "lang": "en"})
    lines = [good, '{"doc_id": 2, "text": "broke', "not json at all", good]
    out = parse_batch(_batch(lines), langs=("en",))
    reasons = out.column("reason").to_pylist()
    assert reasons == ["", "malformed_json", "malformed_json", ""]
    # malformed rows carry no recoverable fields
    assert out.column("doc_id").to_pylist()[1] is None


def test_reason_severity_order():
    lines = [
        json.dumps({"doc_id": 1, "text": "", "lang": "xx"}),  # empty beats lang
        json.dumps({"text": "t", "lang": "xx"}),  # missing_id beats bad_lang
        json.dumps({"doc_id": 3, "text": "t", "lang": "xx"}),
        json.dumps({"doc_id": 4, "text": "t"}),  # lang absent -> bad_lang
    ]
    out = parse_batch(_batch(lines), langs=("en",))
    assert out.column("reason").to_pylist() == [
        "empty_text",
        "missing_id",
        "bad_lang",
        "bad_lang",
    ]


def test_url_rows_get_blake2_ids(ray_session, tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"url": "https://a.example/1", "text": "alpha", "lang": "en"},
        {"doc_id": 77, "text": "beta", "lang": "en"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    parsed = read_jsonl_docs(str(p), langs=("en",))
    got = valid_docs(parsed).to_pandas().sort_values("text").reset_index(drop=True)
    assert got.loc[0, "doc_id"] == doc_id_of_url("https://a.example/1")
    assert got.loc[1, "doc_id"] == 77


def test_export_corrupt_rule_and_dead_letter(ray_session, tmp_path):
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array([f"text {i}" for i in range(20)], pa.string()),
            "lang": pa.array(["en"] * 19 + ["xx"], pa.string()),
        }
    )
    out_dir = str(tmp_path / "corpus")
    n = export_jsonl_corpus(
        rd.from_arrow(docs), out_dir, corrupt_mod=(7, 3)
    )
    assert n == 20
    parsed = read_jsonl_docs(out_dir, langs=("en",))
    dead = dead_letter_docs(parsed).to_pandas()
    # doc_ids 3, 10, 17 corrupted -> malformed; doc_id 19 bad_lang
    assert sorted(dead[dead.reason == "malformed_json"].index.tolist()) != []
    assert (dead.reason == "malformed_json").sum() == 3
    assert (dead.reason == "bad_lang").sum() == 1
    ok = valid_docs(parsed).to_pandas()
    assert sorted(ok.doc_id) == [i for i in range(19) if i % 7 != 3]
    # byte-identical text round-trip on the valid side
    src = {i: f"text {i}" for i in range(20)}
    assert all(src[r.doc_id] == r.text for r in ok.itertuples())


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a", "b\nc", "d"], pa.string()),
            "lang": pa.array(["en", "en", "de"], pa.string()),
        }
    )
    out = str(tmp_path / "export")
    write_jsonl(rd.from_arrow(t), out, ["doc_id", "text", "lang"])
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files
    back = read_jsonl_docs(out, langs=("en", "de")).to_pandas()
    assert (back.reason == "").all()
    assert sorted(back.doc_id) == [1, 2, 3]
    assert set(back.text) == {"a", "b\nc", "d"}


def test_type_mismatched_valid_json_is_dead_lettered(ray_session, tmp_path):
    """ADVICE r3 (medium): a line that is valid JSON but type-mismatched
    (doc_id a string, text a number) must dead-letter THAT row, not crash
    the whole batch in the slow-path from_pylist."""
    import ray.data as rd

    from elastiknn_ray.sources.jsonl import dead_letter_docs, parse_batch, valid_docs

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "good one", "lang": "en"}',
                '{"doc_id": "abc", "text": "bad id", "lang": "en"}',
                '{"doc_id": 3, "text": 42, "lang": "en"}',
                '{"doc_id": 4, "text": "also good", "lang": "en"}',
                '"just a string"',
            ]
        )
        + "\n",
        encoding="utf-8",
    )
    parsed = rd.read_text(str(p)).map_batches(
        parse_batch, fn_kwargs={"langs": ("en",)}, batch_format="pyarrow"
    )
    ok = valid_docs(parsed).to_pandas()
    bad = dead_letter_docs(parsed).to_pandas()
    assert sorted(ok["doc_id"].tolist()) == [1, 4]
    assert len(bad) == 3
    assert set(bad["reason"]) == {"malformed_json"}


def test_shorthand_and_object_vector_forms(ray_session, tmp_path):
    """Both JSON vector forms of the reference (docs/pages/api.md:29-81):
    dense object {"values": [...]} == bare-array shorthand; sparse object
    {"true_indices", "total_indices"} == [[...], n] shorthand.  Mixed-shape
    corpora parse; only genuinely malformed vectors dead-letter."""
    import ray.data as rd

    from elastiknn_ray.sources.jsonl import (
        dead_letter_docs,
        parse_batch,
        valid_vectors,
    )

    p = tmp_path / "vecs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "a", "lang": "en", "embedding": [0.1, 0.2]}',
                '{"doc_id": 2, "text": "b", "lang": "en", "embedding": {"values": [0.3, 0.4]}}',
                '{"doc_id": 3, "text": "c", "lang": "en", "signature": {"true_indices": [1, 5], "total_indices": 10}}',
                '{"doc_id": 4, "text": "d", "lang": "en", "signature": [[2, 7], 10]}',
                '{"doc_id": 5, "text": "e", "lang": "en", "embedding": {"values": ["x"]}}',
                '{"doc_id": 6, "text": "f", "lang": "en"}',
            ]
        )
        + "\n",
        encoding="utf-8",
    )
    parsed = rd.read_text(str(p)).map_batches(
        parse_batch, fn_kwargs={"langs": ("en",)}, batch_format="pyarrow"
    )
    rows = sorted(valid_vectors(parsed).take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [1, 2, 3, 4]
    assert list(rows[0]["embedding"]) == [0.1, 0.2]
    assert list(rows[1]["embedding"]) == [0.3, 0.4]
    assert list(rows[2]["sig_indices"]) == [1, 5] and rows[2]["sig_total"] == 10
    assert list(rows[3]["sig_indices"]) == [2, 7] and rows[3]["sig_total"] == 10
    bad = dead_letter_docs(parsed).to_pandas()
    assert len(bad) == 1 and bad["reason"].tolist() == ["malformed_json"]


def test_nested_vector_paths(ray_session, tmp_path):
    """Mirror of DocsWithNestedVectorsSuite.scala (issue #60): a dense
    vector indexed at each of the suite's four nested mapping paths parses
    (fast path for bare arrays, slow path normalizes the object form) and
    an exact L2 self-query returns exactly that doc at score 1.0."""
    import json as _json

    import numpy as np

    from elastiknn_ray.sources.jsonl import read_jsonl_docs, valid_vectors
    from elastiknn_ray.stages.knn import knn_exact_metric

    rng = np.random.default_rng(0)
    vec = [float(round(x, 6)) for x in rng.normal(size=10)]

    def nest(path, value):
        parts = path.split(".")
        out = value
        for p in reversed(parts):
            out = {p: out}
        return out

    for i, path in enumerate(
        ("vec", "foo.vec", "foo.bar.vec", "foo.bar.baz.vec")
    ):
        # doc 1 carries the vector (object form on the deepest path to
        # exercise the slow-path normalization); docs 2-3 have none
        leaf = {"values": vec} if path.count(".") == 3 else vec
        rows = [
            {"doc_id": 1, "text": "the doc with the vector", "lang": "en",
             **nest(path, leaf)},
            {"doc_id": 2, "text": "no vector here", "lang": "en"},
            {"doc_id": 3, "text": "also none", "lang": "en"},
        ]
        p = tmp_path / f"nested_{i}.jsonl"
        p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
        parsed = read_jsonl_docs(str(p), vector_path=path)
        vecs = valid_vectors(parsed).to_pandas()
        assert list(vecs["doc_id"]) == [1], (path, vecs)
        emb = vecs.iloc[0]["embedding"]
        np.testing.assert_allclose(list(emb), vec)
        # exact L2 self-query: 1 hit, score exactly 1.0 (1/(1+0))
        import pyarrow as pa
        import ray.data as rd

        corpus = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([1], pa.int64()),
                    "embedding": pa.array([vec], pa.list_(pa.float32())),
                }
            )
        )
        q = {"ids": np.array([-1]), "matrix": np.array([vec], dtype=np.float64)}
        hits = knn_exact_metric(corpus, q, k=1, metric="l2").to_pandas()
        assert len(hits) == 1 and int(hits.iloc[0]["neighbor_id"]) == 1
        # float32 storage rounds the stored vector; the self-distance is 0
        # up to that rounding
        assert hits.iloc[0]["score"] > 0.9999

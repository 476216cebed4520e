"""JSONL document source with schema validation and a dead-letter flow —
closes SURVEY.md §2.4 S1 (the reference's entire I/O surface is JSON:
XContentCodec.scala:1-696, client-python/elastiknn/api.py; Common-Crawl
adjacent corpora arrive as JSONL).

Design: `ray.data.read_text` streams raw lines (no driver materialization);
a per-batch kernel parses each batch's lines in ONE `pyarrow.json` call
(vectorized C++ parse).  Only when a batch contains malformed JSON does a
per-line fallback isolate the bad rows — the rare path pays per-row Python,
the common path never does.  Schema validation (required fields, lang
allow-list, text non-empty) is pure `pyarrow.compute`; rejects are emitted
as rows with a ``reason`` column instead of throwing per-row
(VectorMapper.scala:28-29 semantics — reject, don't crash the bulk)."""

from __future__ import annotations

import io
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

#: unified output schema of the parse stage: raw parsed fields + parse
#: status.  Docs carry either a ``doc_id`` (re-ingest of engine output) or
#: a ``url`` (fresh crawl rows; id derived by blake2 like the Parquet path).
#: Vector fields accept BOTH the reference's JSON forms
#: (docs/pages/api.md:29-81, XContentCodec.scala): dense ``embedding`` as
#: ``{"values": [...]}`` or the bare-array shorthand; sparse ``signature``
#: as ``{"true_indices": [...], "total_indices": n}`` or the
#: ``[[...], n]`` shorthand.  The bare dense array is the only form the
#: vectorized fast parse types natively; any other form drops the batch to
#: the per-line slow path, which normalizes row by row.
_FIELDS = [
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("embedding", pa.list_(pa.float64())),
    ("sig_indices", pa.list_(pa.int64())),
    ("sig_total", pa.int64()),
]
_PARSE_SCHEMA = pa.schema(_FIELDS)

#: what the FAST pyarrow.json parse sees: the raw doc fields; ``signature``
#: object form is typed as a struct so single-form corpora stay on the fast
#: path; shorthand ``[[...], n]`` (heterogeneous list) falls to slow.
_FAST_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("embedding", pa.list_(pa.float64())),
        (
            "signature",
            pa.struct(
                [("true_indices", pa.list_(pa.int64())), ("total_indices", pa.int64())]
            ),
        ),
    ]
)


def _num_list(v, what: str) -> list[float]:
    if not isinstance(v, list) or any(
        isinstance(x, bool) or not isinstance(x, (int, float)) for x in v
    ):
        raise ValueError(f"{what} not a numeric list")
    return [float(x) for x in v]


def _int_list(v, what: str) -> list[int]:
    if not isinstance(v, list) or any(
        isinstance(x, bool) or not isinstance(x, int) for x in v
    ):
        raise ValueError(f"{what} not an integer list")
    return v


def _walk_path(obj: dict, vector_path: str):
    """Fetch a value at a dotted path (DocsWithNestedVectorsSuite.scala /
    issue #60: vectors may live at e.g. ``foo.bar.vec``).  Missing levels
    yield None (no vector); a non-object intermediate is a type mismatch."""
    node = obj
    parts = vector_path.split(".")
    for p in parts[:-1]:
        if node is None:
            return None
        if not isinstance(node, dict):
            raise ValueError(f"{vector_path}: {p!r} not an object")
        node = node.get(p)
    if node is None:
        return None
    if not isinstance(node, dict):
        raise ValueError(f"{vector_path}: parent not an object")
    return node.get(parts[-1])


def _coerce_row(obj: dict, vector_path: str = "embedding") -> dict:
    """Schema-check one parsed object against _PARSE_SCHEMA's field types;
    raises ValueError on any type mismatch so the caller dead-letters the
    row instead of letting ``pa.Table.from_pylist`` fail the WHOLE batch
    (reject-don't-crash, VectorMapper.scala:28-29).  Normalizes BOTH vector
    JSON forms (object + shorthand, docs/pages/api.md:29-81)."""
    doc_id = obj.get("doc_id")
    if doc_id is not None and (isinstance(doc_id, bool) or not isinstance(doc_id, int)):
        raise ValueError("doc_id not an integer")
    row = {"doc_id": doc_id}
    for f in ("url", "text", "lang"):
        v = obj.get(f)
        if v is not None and not isinstance(v, str):
            raise ValueError(f"{f} not a string")
        row[f] = v
    emb = _walk_path(obj, vector_path)
    if emb is None:
        row["embedding"] = None
    elif isinstance(emb, dict):  # object form {"values": [...]}
        row["embedding"] = _num_list(emb.get("values"), "embedding.values")
    else:  # bare-array shorthand
        row["embedding"] = _num_list(emb, "embedding")
    sig = obj.get("signature")
    if sig is None:
        row["sig_indices"] = None
        row["sig_total"] = None
    else:
        if isinstance(sig, dict):  # object form
            ti, tot = sig.get("true_indices"), sig.get("total_indices")
        elif isinstance(sig, list) and len(sig) == 2:  # [[...], n] shorthand
            ti, tot = sig
        else:
            raise ValueError("signature not object or 2-item shorthand")
        if isinstance(tot, bool) or not isinstance(tot, int):
            raise ValueError("total_indices not an integer")
        row["sig_indices"] = _int_list(ti, "true_indices")
        row["sig_total"] = tot
    return row


def _fast_schema_for(vector_path: str) -> pa.Schema:
    """FAST-parse schema with the dense vector typed at its (possibly
    dotted) path as a nested struct chain."""
    if vector_path == "embedding":
        return _FAST_SCHEMA
    parts = vector_path.split(".")
    field = pa.field(parts[-1], pa.list_(pa.float64()))
    for p in reversed(parts[:-1]):
        field = pa.field(p, pa.struct([field]))
    return pa.schema([f for f in _FAST_SCHEMA if f.name != "embedding"] + [field])


def _extract_vec(t: pa.Table, vector_path: str):
    """Nested-path vector column → flat list<float64> (nulls propagate
    through missing intermediate objects)."""
    parts = vector_path.split(".")
    col = t.column(parts[0])
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for p in parts[1:]:
        col = pc.struct_field(col, p)
    return col


def _parse_lines(
    lines: list[str], vector_path: str = "embedding"
) -> tuple[pa.Table, np.ndarray]:
    """One vectorized pyarrow.json parse of a batch of JSONL lines; on
    malformed input, per-line isolation (slow path, malformed rows only).
    Returns (parsed table, bad-line mask)."""
    blob = ("\n".join(lines)).encode("utf-8")
    opts = pj.ParseOptions(
        explicit_schema=_fast_schema_for(vector_path),
        unexpected_field_behavior="ignore",
    )
    try:
        t = pj.read_json(io.BytesIO(blob), parse_options=opts)
        if t.num_rows == len(lines):
            bad = np.zeros(len(lines), dtype=bool)
            sig = t.column("signature")
            if isinstance(sig, pa.ChunkedArray):
                sig = sig.combine_chunks()
            t = pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "url": t.column("url"),
                    "text": t.column("text"),
                    "lang": t.column("lang"),
                    "embedding": _extract_vec(t, vector_path),
                    "sig_indices": sig.field("true_indices"),
                    "sig_total": sig.field("total_indices"),
                }
            ).cast(_PARSE_SCHEMA)
            return t, bad
    except pa.ArrowInvalid:
        pass
    # slow path: isolate malformed lines one by one (pa.json can also merge
    # or drop rows on embedded newlines/blank lines — count mismatch lands
    # here too)
    rows = []
    bad = np.zeros(len(lines), dtype=bool)
    for i, ln in enumerate(lines):
        try:
            obj = json.loads(ln)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
            rows.append(_coerce_row(obj, vector_path))
        except (ValueError, TypeError):
            bad[i] = True
            rows.append({"doc_id": None, "url": None, "text": None, "lang": None})
    return pa.Table.from_pylist(rows, schema=_PARSE_SCHEMA), bad


def parse_batch(
    batch: pa.Table, *, langs: tuple[str, ...], vector_path: str = "embedding"
) -> pa.Table:
    """(text:string raw lines) → parsed rows + ``reason`` column:
    '' = valid, else one of 'malformed_json', 'missing_id', 'empty_text',
    'bad_lang' (most severe wins)."""
    lines = batch.column("text").to_pylist()
    t, bad = _parse_lines(lines, vector_path)
    url = t.column("url")
    doc_id = t.column("doc_id")
    text = t.column("text")
    lang = t.column("lang")
    n = t.num_rows
    reason = np.full(n, "", dtype=object)
    bad_lang = pc.fill_null(
        pc.invert(pc.is_in(lang, value_set=pa.array(list(langs), pa.string()))),
        True,
    ).to_numpy(zero_copy_only=False)
    reason[np.asarray(bad_lang, dtype=bool)] = "bad_lang"
    empty_text = pc.fill_null(
        pc.or_kleene(text.is_null(), pc.equal(text, pa.scalar(""))), True
    ).to_numpy(zero_copy_only=False)
    reason[np.asarray(empty_text, dtype=bool)] = "empty_text"
    no_id = np.asarray(
        url.is_null().to_numpy(zero_copy_only=False), bool
    ) & np.asarray(doc_id.is_null().to_numpy(zero_copy_only=False), bool)
    reason[no_id] = "missing_id"
    reason[bad] = "malformed_json"
    return pa.table(
        {
            "doc_id": doc_id,
            "url": url,
            "text": text,
            "lang": lang,
            "embedding": t.column("embedding"),
            "sig_indices": t.column("sig_indices"),
            "sig_total": t.column("sig_total"),
            "reason": pa.array(reason.tolist(), pa.string()),
        }
    )


def read_jsonl_docs(
    path: str,
    *,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    vector_path: str = "embedding",
):
    """path (file/dir of .jsonl) → one Dataset of parsed rows with a
    ``reason`` column ('' = valid).  Split it with :func:`valid_docs` /
    :func:`dead_letter_docs` — both are lazy filters over the SAME parse
    stage, so a pipeline consuming the two sides still parses once.
    ``vector_path`` addresses the dense vector at a (possibly dotted)
    nested path, e.g. ``foo.bar.vec`` — the reference indexes vectors at
    nested mapping paths (DocsWithNestedVectorsSuite.scala, issue #60);
    the parsed column is always emitted as ``embedding``."""
    import ray.data as rd

    lines = rd.read_text(path)
    return lines.map_batches(
        parse_batch,
        fn_kwargs={"langs": tuple(langs), "vector_path": vector_path},
        batch_format="pyarrow",
    )


def valid_docs(parsed):
    """Accepted rows as (doc_id, text, lang): a row's own doc_id wins; rows
    carrying only a url get the stable blake2 id (the Parquet ingest's
    derivation, stages/hashing.doc_id_of_url)."""
    from elastiknn_ray.stages.hashing import doc_ids_of_url_array

    def accept(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t.column("reason"), pa.scalar("")))
        ids = kept.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = pc.fill_null(ids, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        need = np.asarray(ids.is_null().to_numpy(zero_copy_only=False), bool)
        if need.any():  # url-only rows: batched blake2 derivation
            out[need] = doc_ids_of_url_array(
                kept.filter(pa.array(need)).column("url")
            ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(out, pa.int64()),
                "text": kept.column("text"),
                "lang": kept.column("lang"),
            }
        )

    return parsed.map_batches(accept, batch_format="pyarrow")


def valid_vectors(parsed):
    """Accepted rows carrying a vector, as (doc_id, embedding, sig_indices,
    sig_total) — both the object and shorthand JSON forms arrive here
    normalized (docs/pages/api.md:29-81)."""
    import pyarrow.compute as _pc

    def f(t: pa.Table) -> pa.Table:
        keep = _pc.and_kleene(
            _pc.equal(t.column("reason"), pa.scalar("")),
            _pc.or_kleene(
                _pc.invert(t.column("embedding").is_null()),
                _pc.invert(t.column("sig_indices").is_null()),
            ),
        )
        return t.filter(keep).select(
            ["doc_id", "embedding", "sig_indices", "sig_total"]
        )

    return parsed.map_batches(f, batch_format="pyarrow")


def dead_letter_docs(parsed):
    """Rejected rows (ids may be null for malformed lines) + reject reason."""
    return parsed.map_batches(
        lambda t: t.filter(
            pc.invert(pc.equal(t.column("reason"), pa.scalar("")))
        ).select(["doc_id", "url", "reason"]),
        batch_format="pyarrow",
    )


def export_jsonl_corpus(
    docs_ds,
    out_dir: str,
    *,
    corrupt_mod: tuple[int, int] | None = None,
) -> int:
    """Export a (doc_id, text, lang) Dataset to a directory of JSONL shards
    — each map_batches worker writes its OWN shard file (the scale-true
    pattern: no driver materialization, one file per block, resumable by
    re-running).  ``corrupt_mod=(m, r)`` deterministically truncates the
    serialized line of every doc with ``doc_id % m == r`` (always yields
    invalid JSON: the trailing ``"<lang>"}`` is at most 5 bytes), so the
    malformed-JSON dead-letter path is exercised by a rule an SQL oracle can
    reproduce.  Per-row ``json.dumps`` is inherent to the export format and
    off the query hot path.  Returns the number of exported lines."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def w(t: pa.Table) -> pa.Table:
        lines = []
        for r in t.select(["doc_id", "text", "lang"]).to_pylist():
            ln = json.dumps(
                {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]},
                ensure_ascii=False,
            )
            if corrupt_mod is not None and r["doc_id"] % corrupt_mod[0] == corrupt_mod[1]:
                ln = ln[:-5]
            lines.append(ln)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    out = docs_ds.map_batches(w, batch_format="pyarrow").sum("n")
    return int(out or 0)


def write_jsonl(ds, path: str, columns: list[str]) -> None:
    """Deterministic JSONL export via Ray Data's native distributed JSON
    writer (one file per block — never one giant file)."""
    ds.select_columns(columns).write_json(path)

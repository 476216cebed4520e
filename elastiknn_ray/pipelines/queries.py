"""The driver-facing query registry: one entry per implemented operator /
pipeline (SURVEY.md §2), each with a DuckDB oracle where ANSI-SQL can express
the semantics (``__ray_entry__.py`` contract).

Design rules for oracle-checked queries:
- identical output column NAMES in Ray and SQL;
- integer/string outputs wherever possible (floats only where values pass
  through untouched or arithmetic is exact), so order-insensitive value
  hashes match bit-for-bit;
- any float ordering uses a deterministic (score, id) tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from elastiknn_ray.config import DedupConfig, JaccardLshConfig, ShingleConfig
from elastiknn_ray.stages.components import connected_components
from elastiknn_ray.stages.dedup import exact_dedup_groups, keep_first_in_group
from elastiknn_ray.stages.hashing import SignatureStage, decode_u64_lists
from elastiknn_ray.stages.knn import knn_exact
from elastiknn_ray.stages.pairs import candidate_pairs

#: operating config for the documents-table near-dup queries: at tau=0.5,
#: P[pair at J=0.5 becomes a candidate] = 1-(1-0.5^3)^64 ≈ 0.9998 >= 0.99.
DOCS_DEDUP_CFG = DedupConfig(
    shingle=ShingleConfig(k=5),
    lsh=JaccardLshConfig(L=64, k=3, seed=0),
    tau=0.5,
    hot_band_cap=256,
)

SHINGLE_K = 5


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- documents

def q_token_counts(sf_dir: str):
    """Token counting (text-analysis op): whitespace tokens per doc — one
    RE2 C scan per batch (a token is a maximal \\S+ run, exactly the
    oracle's split-and-drop-empties)."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), r"\S+"
        ).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


#: BPE-ish pre-tokenization: word runs OR single non-word-non-space marks —
#: the classic GPT-2-style splitter reduced to an RE2-compatible core so the
#: DuckDB oracle can mirror it exactly.
TOKEN_REGEX = r"\w+|[^\w\s]"


def q_token_counts_regex(sf_dir: str):
    """Token counting, regex mode (word runs + punctuation marks) — RE2
    count_substring_regex, the same engine the DuckDB oracle uses.

    Semantics note (intentional): RE2's ``\\w`` is ASCII-only, so non-ASCII
    letters fall into ``[^\\w\\s]`` and count one token per character.  This
    is the documented contract — engine and oracle agree exactly because
    both run RE2; Unicode-word semantics would need ``[\\p{L}\\p{N}_]`` on
    BOTH sides and is deliberately not what this operator does."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), TOKEN_REGEX
        ).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_doc_stats(sf_dir: str):
    """Quality-scoring primitives: token count + total token length.  The
    sum of token lengths over \\S+ runs equals the count of non-whitespace
    chars, so both stats are single RE2 scans."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = pc.fill_null(batch.column("text"), "")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pc.count_substring_regex(txt, r"\S+").cast(pa.int64()),
                "sum_token_len": pc.count_substring_regex(txt, r"\S").cast(
                    pa.int64()
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_docs_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    return (
        _read(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
    )


def q_doc_length_deciles(sf_dir: str):
    """EXACT order statistics at scale via the histogram pattern: deciles of
    n_chars computed from per-value counts (a small groupby) + a driver-side
    cumulative walk — no global sort, valid whenever the value cardinality
    is bounded (lengths, scores, bucketed floats).  Decile d = the value at
    0-based rank floor(d * (N-1) / 10) of the sorted multiset."""
    import ray.data as rd
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "documents", ["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
        .sort_values("n_chars")
    )
    vals = counts["n_chars"].to_numpy()
    cnt = counts["cnt"].to_numpy().astype(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    out_d, out_v = [], []
    for d in range(11):
        rank = d * (n - 1) // 10
        ix = int(np.searchsorted(cum, rank + 1))
        out_d.append(d)
        out_v.append(int(vals[ix]))
    return rd.from_arrow(
        pa.table(
            {
                "decile": pa.array(out_d, pa.int64()),
                "n_chars": pa.array(out_v, pa.int64()),
            }
        )
    )


def q_frequent_tokens(sf_dir: str, topk: int = 50):
    """Vocabulary building: the corpus's top-k tokens by DOCUMENT frequency
    (distinct per doc), deterministic (count desc, token asc) order.  The
    per-batch kernel pre-aggregates (combiner) so the shuffle moves one row
    per (batch, distinct token), never raw token streams."""
    from ray.data.aggregate import Sum

    def partial_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.utf8_split_whitespace(
            pc.fill_null(pc.utf8_lower(t.column("text")), "")
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values.slice(off[0], off[-1] - off[0])
        off = off - off[0]
        words = flat.to_numpy(zero_copy_only=False)
        n = t.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        lens = pa.compute.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = lens > 0
        words, doc_of = words[keep], doc_of[keep]
        codes, uniq = pd.factorize(words, sort=False)
        # distinct (doc, token) pairs, then per-token doc counts (combiner)
        key = doc_of * (len(uniq) + 1) + codes
        ukey = np.unique(key)
        tok_ix = (ukey % (len(uniq) + 1)).astype(np.int64)
        cnt = np.bincount(tok_ix, minlength=len(uniq)).astype(np.int64)
        nz = cnt > 0
        return pa.table(
            {
                "token": pa.array(uniq[nz], pa.string()),
                "n_docs": pa.array(cnt[nz], pa.int64()),
            }
        )

    counts = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    return (
        counts.sort(["n_docs", "token"], descending=[True, False])
        .limit(topk)
        .map_batches(
            lambda t: pa.table(
                {
                    "token": t.column("token"),
                    "n_docs": t.column("n_docs").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


#: Knuth multiplicative-hash sampling constant (public knowledge)
_SAMPLE_MULT = 2654435761
_SAMPLE_MOD = 1 << 32


def q_sampled_docs(sf_dir: str, rate_pct: int = 5):
    """Deterministic seeded sampling (SURVEY.md §2.6 sampling row): keep a
    doc iff (doc_id * 2654435761) mod 2^32 falls in the lowest rate_pct% —
    pure integer arithmetic, so the SQL oracle reproduces the exact sample.
    Stable across runs, partitionings, and engines (no RNG state).  The
    multiply runs in uint64 (wrap-exact mod 2^64, then mask to 2^32) so
    doc_ids beyond ~3.49e9 agree with a mod-2^32 SQL oracle instead of
    silently wrapping in int64."""
    threshold = (_SAMPLE_MOD * rate_pct) // 100

    def f(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ((d * np.uint64(_SAMPLE_MULT)) & np.uint64(_SAMPLE_MOD - 1)) < threshold
        return t.filter(pa.array(keep)).select(["doc_id", "n_chars"])

    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: representative (min doc_id) + multiplicity per distinct
    text, keyed by 64-bit content hash (stages/dedup.py)."""
    return exact_dedup_groups(_read(sf_dir, "documents", ["doc_id", "text"]))


def _shingle_bands(batch: pa.Table) -> pa.Table:
    """Every shingle is its own band → candidate generation is exhaustive for
    any pair with Jaccard > 0 (the brute-force/oracle analogue of LSH bands;
    ExactQuery.scala:18-50 in spirit)."""
    offsets, values = decode_u64_lists(batch.column("shingles"))
    counts = np.diff(offsets)
    docs = np.repeat(batch.column("doc_id").to_numpy(), counts)
    return pa.table(
        {"doc_id": pa.array(docs, pa.int64()), "band_hash": pa.array(values, pa.uint64())}
    )


def _exact_pairs_ds(sf_dir: str, min_isec: int = 1):
    """(doc_a, doc_b, isec, size_a, size_b) for all pairs sharing >= min_isec
    k-shingles.  ``isec`` = the cross-band collision count of candidate_pairs
    — exact intersection size because every shingle is a band.  Integer-only
    output → bit-stable oracle comparison."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = docs.map_batches(
        SignatureStage(ShingleConfig(k=SHINGLE_K)), batch_format="pyarrow"
    ).materialize()
    bands = sigs.map_batches(_shingle_bands, batch_format="pyarrow")
    # exhaustive mode: cap larger than any group (hottest shingle ~ O(10) docs
    # in this corpus; a capped/starred group would corrupt the isec count)
    cands = candidate_pairs(bands, cap=1 << 30, count_col="isec")
    sizes = sigs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_shingles": t.column("n_shingles").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    a = cands.join(
        sizes, join_type="inner", num_partitions=8, on=("doc_a",), right_on=("doc_id",)
    )
    a = a.rename_columns({"n_shingles": "size_a"}).select_columns(
        ["doc_a", "doc_b", "isec", "size_a"]
    )
    b = a.join(
        sizes, join_type="inner", num_partitions=8, on=("doc_b",), right_on=("doc_id",)
    )
    b = b.rename_columns({"n_shingles": "size_b"}).select_columns(
        ["doc_a", "doc_b", "isec", "size_a", "size_b"]
    )
    if min_isec > 1:
        b = b.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t.column("isec"), pa.scalar(min_isec))
            ),
            batch_format="pyarrow",
        )
    return b


def q_exact_shingle_pairs(sf_dir: str):
    return _exact_pairs_ds(sf_dir)


def q_dup_clusters_exact(sf_dir: str):
    """Connected components over pairs with exact Jaccard >= 0.5 (integer
    criterion 3·isec >= size_a+size_b)."""
    pairs = _exact_pairs_ds(sf_dir)
    edges = pairs.map_batches(
        lambda t: (
            lambda m: pa.table(
                {"u": t.column("doc_a").filter(m), "v": t.column("doc_b").filter(m)}
            )
        )(
            pa.compute.greater_equal(
                pa.compute.multiply(t.column("isec"), pa.scalar(3, pa.int64())),
                pa.compute.add(t.column("size_a"), t.column("size_b")),
            )
        ),
        batch_format="pyarrow",
    )
    return connected_components(edges)


def q_shingle_posting_histogram(sf_dir: str):
    """Posting-size histogram over the shingle inverted index — the hot-key
    diagnostic behind the hot_band_cap policy (SURVEY.md §4): how many
    shingles have posting lists of each size.  Distinct-count + double
    aggregation with a bit-exact SQL oracle."""
    from ray.data.aggregate import Count

    sigs = _doc_signatures(sf_dir)
    bands = sigs.map_batches(_shingle_bands, batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band_hash": t.column("band_hash"),
                "part": pa.array(
                    t.column("band_hash").to_numpy(zero_copy_only=False)
                    % np.uint64(16),
                    pa.uint64(),
                ),
            }
        )

    def posting_sizes(t: pa.Table) -> pa.Table:
        h = t.column("band_hash").to_numpy(zero_copy_only=False)
        _, cnt = np.unique(h, return_counts=True)
        return pa.table({"posting_size": pa.array(cnt.astype(np.int64), pa.int64())})

    sizes = (
        bands.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: posting_sizes(t.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return sizes.groupby("posting_size").aggregate(Count(alias_name="n_shingles"))


def q_lsh_dup_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents (flagship path; approximate
    candidate generation + exact verification — no closed-form SQL oracle).
    prepare_batch keeps the table's own doc_id column."""
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    res = near_dup_pipeline(docs, DOCS_DEDUP_CFG, num_partitions=8)
    return res.pairs


def q_lsh_clusters(sf_dir: str):
    from elastiknn_ray.pipelines.near_dup import near_dup_pipeline

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    res = near_dup_pipeline(docs, DOCS_DEDUP_CFG, num_partitions=8)
    return res.clusters


def q_simhash_pairs(sf_dir: str):
    """SimHash/Hamming near-dup pairs (bit-sampling LSH + exact packed-Hamming
    verify; rows-only driver check — signature arithmetic is not
    SQL-expressible.  Pytest oracles: tests/test_simhash.py)."""
    from elastiknn_ray.config import SimHashDedupConfig
    from elastiknn_ray.pipelines.near_dup import simhash_near_dup_pipeline

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    res = simhash_near_dup_pipeline(docs, SimHashDedupConfig(), num_partitions=8)
    return res.pairs


def q_simhash_clusters(sf_dir: str):
    from elastiknn_ray.config import SimHashDedupConfig
    from elastiknn_ray.pipelines.near_dup import simhash_near_dup_pipeline

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    res = simhash_near_dup_pipeline(docs, SimHashDedupConfig(), num_partitions=8)
    return res.clusters


def q_invalid_docs(sf_dir: str):
    """Validation / dead-letter filter (SURVEY.md §2.2 I1): rows rejected by
    the schema validator — empty text or unknown lang — emitted as a reject
    table instead of throwing per-row (VectorMapper.scala:28-29 semantics)."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = pc.or_(
            pc.equal(batch.column("text"), pa.scalar("")),
            pc.invert(
                pc.is_in(
                    batch.column("lang"),
                    value_set=pa.array(["en", "de", "fr"], pa.string()),
                )
            ),
        )
        return batch.filter(bad).select(["doc_id"])

    return _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


def _jsonl_corpus_dir(sf_dir: str) -> str:
    """Deterministic JSONL mirror of the documents table (closes SURVEY.md
    §2.4 S1's JSON side): exported once per sf_dir into /tmp by map_batches
    shard writers, with a deterministic malformed-line rule (doc_id%101==7 →
    truncated JSON) so the dead-letter flow sees real parse failures.  The
    export re-runs when the directory is absent OR the Parquet source files
    changed (cache key includes the source paths + sizes + mtimes, so a
    regenerated table at the same path invalidates the mirror)."""
    import glob
    import hashlib
    import os
    import shutil

    from elastiknn_ray.sources.jsonl import export_jsonl_corpus

    h = hashlib.blake2s(sf_dir.encode(), digest_size=8)
    for p in sorted(glob.glob(os.path.join(sf_dir, "documents*.parquet"))) or sorted(
        glob.glob(os.path.join(sf_dir, "documents", "*.parquet"))
    ):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    key = h.hexdigest()
    out = f"/tmp/elastiknn_jsonl/{key}"
    marker = f"{out}.done"  # sibling, NOT inside: read_text scans the whole dir
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        export_jsonl_corpus(
            _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
            out,
            corrupt_mod=(101, 7),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def q_jsonl_valid_docs(sf_dir: str):
    """JSONL ingest, accepted side (SURVEY.md §2.4 S1; the reference's whole
    I/O surface is JSON — XContentCodec.scala:1-696): read_text → one
    vectorized pyarrow.json parse per batch → pure-Arrow validation →
    (doc_id, nchars, lang) of rows passing every check."""
    import pyarrow.compute as pc

    from elastiknn_ray.sources.jsonl import read_jsonl_docs, valid_docs

    parsed = read_jsonl_docs(_jsonl_corpus_dir(sf_dir), langs=("en", "de", "fr"))

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "nchars": pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                "lang": t.column("lang"),
            }
        )

    return valid_docs(parsed).map_batches(stats, batch_format="pyarrow")


def q_jsonl_dead_letter(sf_dir: str):
    """JSONL ingest, rejected side: every line that failed parse or
    validation, with the most-severe reason (malformed_json > missing_id >
    empty_text > bad_lang) — VectorMapper.scala:28-29 reject-don't-crash
    semantics.  Malformed lines have no recoverable id → -1 sentinel."""
    import pyarrow.compute as pc

    from elastiknn_ray.sources.jsonl import dead_letter_docs, read_jsonl_docs

    parsed = read_jsonl_docs(_jsonl_corpus_dir(sf_dir), langs=("en", "de", "fr"))

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.fill_null(t.column("doc_id"), pa.scalar(-1, pa.int64())),
                "reason": t.column("reason"),
            }
        )

    return dead_letter_docs(parsed).map_batches(shape, batch_format="pyarrow")


def q_dedup_decisions(sf_dir: str):
    """End-product keep/drop decision per doc (exact > near > substring
    priority; pipelines/decide.py).  Rows-only driver check; semantics pinned
    in tests/test_decide.py."""
    from elastiknn_ray.pipelines.decide import dedup_decisions

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup_decisions(docs, DOCS_DEDUP_CFG, num_partitions=8)


def q_quality_counts(sf_dir: str):
    """Integer surface statistics per doc (text/analysis.py quality_counts) —
    every count mirrored exactly in the DuckDB oracle."""
    from elastiknn_ray.text.analysis import quality_counts

    def f(batch: pa.Table) -> pa.Table:
        counts = quality_counts(batch.column("text"))
        cols = {"doc_id": batch.column("doc_id")}
        cols.update({k: pa.array(v, pa.int64()) for k, v in counts.items()})
        return pa.table(cols)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_quality_scores(sf_dir: str):
    """Composite [0,1] quality heuristic per doc (Gopher-style soft
    penalties, text/analysis.py quality_score) — the arithmetic is plain
    IEEE-double ops in a fixed order, so the DuckDB oracle reproduces the
    score bit-for-bit from the same integer surface counts."""
    from elastiknn_ray.text.analysis import quality_counts, quality_score

    def f(batch: pa.Table) -> pa.Table:
        counts = quality_counts(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(quality_score(counts), pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_lang_id(sf_dir: str):
    """Stopword-profile language ID (rows-only; profile arithmetic is not
    SQL-expressible — behavior pinned in tests/test_analysis.py)."""
    from elastiknn_ray.text.analysis import language_id

    def f(batch: pa.Table) -> pa.Table:
        langs, _ = language_id(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(langs, pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_doc_fingerprints(sf_dir: str):
    """Min-rolling-hash document fingerprint (rows-only; deterministic)."""
    from elastiknn_ray.text.analysis import doc_fingerprints_arrow

    def f(batch: pa.Table) -> pa.Table:
        fp = doc_fingerprints_arrow(batch.column("text"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(fp.view(np.int64), pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_substring_spans(sf_dir: str):
    """Suffix-array + winnowing substring-duplicate spans (M7; rows-only
    driver check — pytest oracles in tests/test_substring.py)."""
    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return substring_spans(docs, SubstringConfig(num_partitions=8))


def q_substring_spans_ext(sf_dir: str):
    """Maximal-extent substring-duplicate spans (extended cross path: byte
    extension of colliding windows to the exact common run; rows-only
    driver check — extent oracles in tests/test_substring.py)."""
    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return substring_spans(
        docs, SubstringConfig(num_partitions=8, extend_cross=True)
    )


def q_substring_dedup_docs(sf_dir: str):
    """Documents with duplicate substrings removed → (doc_id, n_chars_clean)
    integer summary (rows-only driver check)."""
    from elastiknn_ray.stages.substring import (
        SubstringConfig,
        remove_spans,
        substring_spans,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    spans = substring_spans(docs, SubstringConfig(num_partitions=8))
    clean = remove_spans(docs, spans, num_partitions=8)
    return clean.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars_clean": pa.compute.utf8_length(t.column("text")).cast(
                    pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _doc_signatures(sf_dir: str, k: int | None = None):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(
        SignatureStage(ShingleConfig(k=k or SHINGLE_K)), batch_format="pyarrow"
    )


def q_knn_exact_jaccard(sf_dir: str):
    """Sparse-bool kNN by exact Jaccard over k-shingle sets — the
    reference's core use case (ElastiknnQueryBuilder.scala:38-92 with
    ExactSimilarityFunction.Jaccard).  Queries = doc_id < 20, k = 5;
    candidates restricted to docs sharing >= 1 shingle (inverted-index
    retrieval semantics); integer rank output with (score desc,
    neighbor_id) tie-break."""
    from elastiknn_ray.stages.sparse_knn import gather_query_sets, knn_exact_sparse

    sigs = _doc_signatures(sf_dir, KNN_SHINGLE_K).materialize()
    qs = gather_query_sets(sigs, np.arange(20, dtype=np.int64))
    out = knn_exact_sparse(sigs, qs, k=5, metric="jaccard")
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_exact_hamming(sf_dir: str):
    """Sparse-bool kNN by Hamming similarity over shingle sets
    (ExactModel.java:19-23; ranking by symmetric-difference size — the
    total_indices term cancels).  Same query wave / candidate rule as
    q_knn_exact_jaccard."""
    from elastiknn_ray.stages.sparse_knn import gather_query_sets, knn_exact_sparse

    sigs = _doc_signatures(sf_dir, KNN_SHINGLE_K).materialize()
    qs = gather_query_sets(sigs, np.arange(20, dtype=np.int64))
    out = knn_exact_sparse(sigs, qs, k=5, metric="hamming")
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_hamming_lsh(sf_dir: str):
    """Approximate Hamming kNN over packed SimHash signatures — the
    HammingLshModel read path (bit-sampled bands → cut → exact
    packed-Hamming re-score; stages/simhash.py).  Rows-only driver check;
    recall vs the brute-force packed path pinned in tests/test_simhash.py."""
    from elastiknn_ray.config import HammingLshConfig
    from elastiknn_ray.stages.simhash import (
        SimHashStage,
        gather_query_sigs,
        knn_hamming_lsh,
    )

    dims = 256
    sigs = (
        _doc_signatures(sf_dir, KNN_SHINGLE_K)
        .map_batches(SimHashStage(dims), batch_format="pyarrow")
        .materialize()
    )
    qs = gather_query_sigs(sigs, np.arange(20, dtype=np.int64))
    out = knn_hamming_lsh(
        sigs, qs, k=5,
        lsh=HammingLshConfig(dims=dims, L=64, k=3, seed=0), candidates=100,
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_jaccard_lsh(sf_dir: str):
    """Approximate Jaccard kNN via the full LSH read path (MinHash band
    collisions → candidate cut → exact re-score; stages/sparse_knn.py).
    Rows-only driver check; recall vs the exact path pinned in
    tests/test_sparse_knn.py."""
    from elastiknn_ray.stages.sparse_knn import gather_query_sets, knn_lsh_jaccard

    sigs = _doc_signatures(sf_dir, KNN_SHINGLE_K).materialize()
    qs = gather_query_sets(sigs, np.arange(20, dtype=np.int64))
    out = knn_lsh_jaccard(
        sigs, qs, k=5, lsh=JaccardLshConfig(L=128, k=1, seed=0), candidates=100
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


# ---------------------------------------------------------------- embeddings

EMB_COS_TAU = 0.35  # sf tables: max pairwise cos ~0.48; 0.35 yields a few hundred pairs


def _emb_queries(sf_dir: str, n: int = 10) -> dict:
    """Query wave {ids, matrix}: the vec_id < n rows read straight from
    Parquet (predicate pushdown; no Ray execution round-trip)."""
    import pyarrow.dataset as pads

    t = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n)
        .sort_by("vec_id")
    )
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    qm = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return {"ids": ids, "matrix": qm}


def _emb_dims(sf_dir: str) -> int:
    """Embedding dimensionality straight from the Parquet file (first row of
    the first row group) — no Ray execution round-trip."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    t = f.read_row_group(0, columns=["embedding"])
    return len(t.column("embedding")[0])


def q_emb_cosine_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup (training-data op): all pairs with
    cos >= 0.35, brute-force broadcast path; integer-only output."""
    from elastiknn_ray.stages.cosine_lsh import cosine_dup_pairs_exact

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dup_pairs_exact(emb, EMB_COS_TAU)


def q_emb_cosine_lsh_pairs(sf_dir: str):
    """Hyperplane-LSH candidate generation + exact cosine verify (the scale
    path for embedding near-dup; H3 CosineLshModel).  Rows-only driver check;
    recall vs the exact path is pinned in tests/test_cosine_lsh.py."""
    from elastiknn_ray.config import CosineLshConfig
    from elastiknn_ray.stages.cosine_lsh import cosine_bands_fn, verify_cosine_pairs
    from elastiknn_ray.stages.pairs import candidate_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    dims = _emb_dims(sf_dir)
    bands = emb.map_batches(
        cosine_bands_fn,
        fn_kwargs={"lsh": CosineLshConfig(dims=dims, L=64, k=6, seed=0)},
        batch_format="pyarrow",
        batch_size=2048,
    )
    # small embedding table: 8 coarse partitions, not the 64 default
    cands = candidate_pairs(bands, cap=256, num_partitions=8)
    return verify_cosine_pairs(cands, emb, EMB_COS_TAU, num_partitions=4).select_columns(
        ["vec_a", "vec_b"]
    )


def q_knn_exact_cosine(sf_dir: str):
    """Brute-force cosine kNN: queries = vec_id < 10, k = 5; output ranks
    (ints) with (score desc, neighbor_id) tie-break."""
    import ray.data as rd

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _emb_queries(sf_dir)
    out = knn_exact(
        emb, q, k=5
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


#: Oracle-computable LSH operating point: the hyperplanes are DERIVED
#: constants (JavaRandom(seed) — bit-exact, models/params.py), so the SQL
#: oracle can recompute bucket membership from literal plane vectors and
#: re-run the whole read path (bucket → union of L tables → exact rescore
#: → top-k) in DuckDB.  candidates is set above any possible bucket size
#: so the kthGreatest cut is a no-op (collision COUNTS are engine-internal;
#: membership + rescore order are what SQL can check exactly).
KNN_LSH_ORACLE_CFG = None  # lazily built (needs config import)


def _lsh_oracle_cfg():
    global KNN_LSH_ORACLE_CFG
    if KNN_LSH_ORACLE_CFG is None:
        from elastiknn_ray.config import CosineLshConfig

        KNN_LSH_ORACLE_CFG = CosineLshConfig(dims=64, L=2, k=4, seed=7)
    return KNN_LSH_ORACLE_CFG


def q_knn_lsh_cosine_bucketed(sf_dir: str):
    """The FULL cosine-LSH read path (hash → band collision → cut → exact
    rescore → top-k) at an oracle-computable operating point — the first
    LSH entry DuckDB can hash-compare end-to-end (VERDICT r4 next-round #7).
    candidates exceeds the corpus so the per-query cut keeps every
    colliding doc; the oracle reproduces bucket membership from the derived
    hyperplane constants embedded as SQL literals."""
    from elastiknn_ray.stages.knn import knn_lsh_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _emb_queries(sf_dir)
    out = knn_lsh_cosine(
        emb, q, k=5, candidates=10**6, lsh=_lsh_oracle_cfg()
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def _lsh_cosine_oracle_sql() -> str:
    """Generate the DuckDB mirror of q_knn_lsh_cosine_bucketed: bucket ids
    from sign bits of the SAME derived hyperplanes (float32 constants are
    exact in float64 literals), candidates = same-bucket docs in either
    table, exact-cosine rescore, (score desc, neighbor_id) rank."""
    from elastiknn_ray.models.params import derive_hyperplanes

    cfg = _lsh_oracle_cfg()
    planes = derive_hyperplanes(cfg).planes  # (L*k, dims) float32

    def bucket(tbl: int) -> str:
        bits = []
        for j in range(cfg.k):
            row = planes[tbl * cfg.k + j]
            lit = "[" + ",".join(repr(float(v)) for v in row) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(bits)

    return f"""
        WITH b AS (SELECT vec_id, embedding,
                          {bucket(0)} AS b0,
                          {bucket(1)} AS b1
                   FROM embeddings),
        q AS (SELECT * FROM b WHERE vec_id < 10),
        s AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, d.embedding) AS score
              FROM q JOIN b d
                ON (q.b0 = d.b0 OR q.b1 = d.b1) AND d.vec_id <> q.vec_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5"""


def _knn_metric_query(sf_dir: str, metric: str):
    from elastiknn_ray.stages.knn import knn_exact_metric

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _emb_queries(sf_dir)
    out = knn_exact_metric(emb, q, k=5, metric=metric)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_exact_l2(sf_dir: str):
    """Brute-force L2 kNN, reference score 1/(1+dist) (ExactModel.java:26-28);
    integer rank output."""
    return _knn_metric_query(sf_dir, "l2")


def q_knn_exact_l1(sf_dir: str):
    """Brute-force L1 kNN (ExactModel.java:31-33); integer rank output."""
    return _knn_metric_query(sf_dir, "l1")


def q_knn_filtered_cosine(sf_dir: str):
    """Filter + kNN composition (SURVEY.md §2.3 Q8: elastiknn inside a bool
    filter query): brute-force cosine kNN restricted to corpus label = 0."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    q = _emb_queries(sf_dir)
    corpus = emb.filter(expr="label == 0").select_columns(["vec_id", "embedding"])
    out = knn_exact(corpus, q, k=5)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_rescored_cosine_l2(sf_dir: str):
    """Generic rescorer composition (SURVEY.md §2.3 Q8's second half;
    QueryRescorerSuite.scala): an arbitrary upstream scored set — here
    exact-cosine top-20 per query — is cut to top-n by the UPSTREAM score,
    exact-L2 re-scored (1/(1+dist), ExactModel.java:26-28) and returned as
    the per-query top-5 under the exact score."""
    from elastiknn_ray.stages.knn import rescore_topn

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    upstream = knn_exact(emb, q, k=20)
    out = rescore_topn(upstream, emb, q, n=20, k=5, metric="l2")
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_indexed_cross(sf_dir: str):
    """Cross-table Vec.Indexed (SURVEY.md §2.3 Q6 full nuance,
    ElasticsearchQueryBuilder.scala:94-160): the query wave is fetched BY ID
    from a DIFFERENT Parquet table than the corpus — a /tmp mirror of the
    vec_id < 10 rows stands in for 'another index'; the corpus is the
    label != 0 slice of the embeddings table."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from elastiknn_ray.stages.knn import fetch_indexed_vectors

    # materialize the foreign query table (tiny, deterministic, rewritten
    # every call so staleness is impossible)
    src = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < 10
    )
    qdir = f"/tmp/elastiknn_qtab_{os.getpid()}"
    os.makedirs(qdir, exist_ok=True)
    qpath = os.path.join(qdir, "queries.parquet")
    pq.write_table(src, qpath)

    q = fetch_indexed_vectors(qpath, np.arange(10))
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    corpus = emb.filter(expr="label != 0").select_columns(["vec_id", "embedding"])
    out = knn_exact(corpus, q, k=7)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_lsh_cosine(sf_dir: str):
    """Approximate cosine kNN via the reference's full read path (countHits →
    kthGreatest cut → exact re-score; stages/knn.py knn_lsh_cosine).
    Rows-only driver check; recall vs the exact path pinned in
    tests/test_knn.py."""
    from elastiknn_ray.stages.knn import knn_lsh_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    out = knn_lsh_cosine(emb, q, k=5, candidates=100)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_lsh_cosine_score_fn(sf_dir: str):
    """Q5 score-function mode: candidates ranked by the band-collision
    fraction matchingHashes/totalHashes with NO exact re-rank
    (HashingQuery.scala:40-83).  Rows-only driver check."""
    from elastiknn_ray.stages.knn import knn_lsh_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    out = knn_lsh_cosine(emb, q, k=5, candidates=100, rescore=False)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_ivf_cosine(sf_dir: str):
    """IVF-Flat ANN (stages/ivf.py): spherical-kmeans cells + nprobe search,
    exact re-score.  Rows-only driver check; recall pinned vs exact in
    tests/test_knn.py."""
    from elastiknn_ray.stages.ivf import knn_ivf_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    out = knn_ivf_cosine(emb, q, k=5, n_cells=16, nprobe=8)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_perm_cosine(sf_dir: str):
    """Permutation-LSH kNN with FREQ-CAPPED match counting (min(freq_q,
    freq_d) per term — ArrayHitCounter.java:34-41) + exact cosine re-score.
    Rows-only driver check; counting semantics pinned against the
    reference's behavioral example in tests/test_knn.py."""
    from elastiknn_ray.config import PermutationLshConfig
    from elastiknn_ray.stages.knn import knn_perm_cosine

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    out = knn_perm_cosine(
        emb, q, k=5, perm=PermutationLshConfig(k=16, repeating=True), candidates=100
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_knn_l2_lsh(sf_dir: str):
    """L2-LSH kNN with query-side multiprobe (probes=3, the reference's
    ann-benchmarks config shape).  Rows-only driver check; the
    recall-rises-with-probes property is pinned in tests/test_knn.py."""
    from elastiknn_ray.config import L2LshConfig
    from elastiknn_ray.stages.knn import knn_l2_lsh

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    q = _emb_queries(sf_dir)
    out = knn_l2_lsh(
        emb,
        q,
        k=5,
        lsh=L2LshConfig(dims=q["matrix"].shape[1], L=32, k=4, w=4, seed=0),
        probes=3,
        candidates=100,
    )
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_emb_l2_lsh_pairs(sf_dir: str):
    """L2-LSH candidate pairs + exact cosine verify over embeddings (H4
    no-probe path; rows-only driver check)."""
    from elastiknn_ray.config import L2LshConfig
    from elastiknn_ray.stages.cosine_lsh import verify_cosine_pairs
    from elastiknn_ray.stages.float_lsh import l2_bands_fn
    from elastiknn_ray.stages.pairs import candidate_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    dims = _emb_dims(sf_dir)
    bands = emb.map_batches(
        l2_bands_fn,
        fn_kwargs={"lsh": L2LshConfig(dims=dims, L=16, k=2, w=4, seed=0)},
        batch_format="pyarrow",
        batch_size=2048,
    )
    # small embedding table: 8 coarse partitions, not the 64 default
    cands = candidate_pairs(bands, cap=256, num_partitions=8)
    return verify_cosine_pairs(cands, emb, EMB_COS_TAU, num_partitions=4).select_columns(
        ["vec_a", "vec_b"]
    )


def q_perm_hashes(sf_dir: str):
    """Permutation-LSH hashes per embedding (H5; (doc_id, hash, freq) exploded
    rows) with an exact DuckDB list-function oracle."""
    from elastiknn_ray.config import PermutationLshConfig
    from elastiknn_ray.stages.float_lsh import PermutationLshStage

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = emb.map_batches(
        PermutationLshStage(PermutationLshConfig(k=8, repeating=True)),
        batch_format="pyarrow",
        batch_size=2048,
    )
    return out.rename_columns({"doc_id": "vec_id"})


# ---------------------------------------------------------------- multimodal

def q_image_features(sf_dir: str):
    """Image decode → thumbnail + patch-feature embedding over a
    deterministic synthetic FAKE-codec image table (no image libs in this
    container; the Ray plumbing is real — stages/multimodal.py).  Rows-only
    driver check; ``sf_dir`` is unused (self-generated input)."""
    import ray.data as rd

    from elastiknn_ray.stages.multimodal import ImageDecodeStage, fake_images_table

    ds = rd.from_arrow(fake_images_table(256, seed=11))
    out = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"thumb": 16, "grid": 4},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )
    return out.select_columns(["image_id", "height", "width", "channels"])


def q_video_frames(sf_dir: str):
    """Video frame-sample + per-frame features over a synthetic FAKE-codec
    video table (rows-only driver check; ``sf_dir`` unused) — decode-only-
    sampled-frames semantics with actor-pool plumbing and small batches for
    large blobs."""
    import ray.data as rd

    from elastiknn_ray.stages.multimodal import VideoFrameSampleStage, fake_videos_table

    ds = rd.from_arrow(fake_videos_table(64, seed=13))
    out = ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"every": 5, "max_frames": 6, "thumb": 8, "grid": 2},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 4),
    )
    return out.select_columns(["video_id", "frame_ix"])


def q_audio_chunks(sf_dir: str):
    """Audio chunking + RMS energy over a synthetic FAKE-codec audio table
    (rows-only driver check; ``sf_dir`` unused)."""
    import ray.data as rd

    from elastiknn_ray.stages.multimodal import AudioChunkStage, fake_audio_table

    ds = rd.from_arrow(fake_audio_table(64, seed=12, rate=4000))
    out = ds.map_batches(
        AudioChunkStage,
        fn_constructor_kwargs={"chunk_s": 0.5},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )
    return out.select_columns(["audio_id", "chunk_ix"])


def q_image_dhash_dups(sf_dir: str):
    """Perceptual-hash (dHash) image near-dup pairs over a planted synthetic
    corpus (rows-only driver check; ``sf_dir`` unused — no SQL oracle can
    decode images, but the planted ground-truth recall/precision is pinned
    in tests/test_multimodal.py).  Reuses the Hamming LSH → salted pair
    shuffle → exact packed-Hamming verify path end-to-end
    (pipelines/near_dup.py image_near_dup_pipeline)."""
    import ray.data as rd

    from elastiknn_ray.pipelines.near_dup import image_near_dup_pipeline
    from elastiknn_ray.stages.multimodal import fake_images_with_dups

    ds = rd.from_arrow(fake_images_with_dups(40, dups_per_base=3, seed=21))
    res = image_near_dup_pipeline(ds, hash_concurrency=(1, 4))
    return res.pairs.select_columns(["doc_a", "doc_b", "hamming"]).sort(
        ["doc_a", "doc_b"]
    )


# ---------------------------------------------------------------- events

def q_events_first_by_user_type(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    out = keep_first_in_group(
        ds,
        ["user_id", "event_type"],
        ["ts", "event_id"],
        keep_cols=["user_id", "event_type", "event_id"],
    )
    # Dataset.rename_columns chokes on pandas-format upstream blocks; rename
    # zero-copy on the Arrow table inside map_batches instead.
    return out.map_batches(
        lambda t: t.rename_columns(
            ["first_event_id" if c == "event_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


def q_sessions(sf_dir: str):
    """Sessionization (gaps-and-islands, 30-min gap) over events — windowed
    per-user operator with a window-function SQL oracle."""
    from elastiknn_ray.stages.windows import sessionize

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return sessionize(ds, num_partitions=16)


def q_events_rolling_1h(sf_dir: str):
    """RANGE-window trailing count per event: the user's events within the
    preceding hour (inclusive) — windowed aggregate with an ANSI
    window-function oracle."""
    from elastiknn_ray.stages.windows import trailing_window_count

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return trailing_window_count(ds, num_partitions=16)


def q_top_orders_per_customer(sf_dir: str):
    """Per-group top-k: each customer's 3 priciest orders with ranks."""
    from elastiknn_ray.stages.windows import group_topk

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    return group_topk(
        ds,
        ["o_custkey"],
        ["o_totalprice", "o_orderkey"],
        [False, True],
        3,
        keep_cols=["o_custkey", "o_orderkey"],
    )


def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no order above 300k total price (broadcast
    the distinct matching custkey set — small side — into a filter; the
    anti-join as a broadcast semi-filter rather than a shuffle join)."""
    import ray

    custkeys = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .filter(expr="o_totalprice > 300000")
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    keys = np.sort(
        np.concatenate(
            [
                b.column("o_custkey").to_numpy(zero_copy_only=False)
                for b in custkeys.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    keys_ref = ray.put(keys)

    def f(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        c = t.column("c_custkey").to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            return t
        pos = np.minimum(np.searchsorted(ks, c), len(ks) - 1)
        return t.filter(pa.array(ks[pos] != c))

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_doc_length_histogram(sf_dir: str):
    """Histogram: doc count per 200-char n_chars bucket."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["n_chars"])
    bucketed = ds.map_batches(
        lambda t: pa.table(
            {
                "bucket": pa.array(
                    t.column("n_chars").to_numpy(zero_copy_only=False) // 200,
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed.groupby("bucket").aggregate(Count(alias_name="n_docs"))


def q_events_agg(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    return (
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .groupby(["user_id", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


# ---------------------------------------------------------------- relational

def q_lineitem_agg(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    # sum over whole-number quantities is exact in double precision
    return (
        _read(
            sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"]
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n_rows"), Sum("l_quantity", alias_name="sum_qty")
        )
    )


def q_top_orders(sf_dir: str):
    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


def q_customer_order_counts(sf_dir: str):
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    j = counts.join(
        cust,
        join_type="inner",
        num_partitions=4,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return j.rename_columns({"o_custkey": "c_custkey"}).select_columns(
        ["c_custkey", "c_name", "n_orders"]
    )


# ---------------------------------------------------------------- registry

# ------------------------------------------------- multi-field corpus

TITLE_WORDS = 8
TITLE_SHINGLE_K = 2


def _mf_corpus(sf_dir: str):
    """One corpus, two independently-mapped vector fields
    (VectorMapper.scala:125-131; the multiple/nested-vector suites):
    title_sig = sparse_bool over the first 8 title tokens (k=2 shingles),
    body_emb = dense_float(dims) from the embeddings table, joined on id."""
    from elastiknn_ray.stages.fields import build_multi_field_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return build_multi_field_corpus(
        docs,
        emb,
        title_words=TITLE_WORDS,
        title_shingle=ShingleConfig(k=TITLE_SHINGLE_K),
        dims=_emb_dims(sf_dir),
    )


def _title_top_bigram(sf_dir: str) -> str:
    """The most document-frequent title bigram, ties broken lexicographically
    — the deterministic term-filter probe shared with the SQL oracle.
    Combiner pattern: per-batch partial DF counts (bounded by the bigram
    vocabulary) → small groupby sum → driver top-1."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # trim first: the whitespace splitter emits '' tokens at string
        # edges (' a b' -> ['', 'a', 'b']), which would shift the
        # TITLE_WORDS window and admit empty-token bigrams — the corpus
        # side (build_multi_field_corpus's ^\s* regex) and the SQL
        # oracle (list_filter x <> '') both ignore edge whitespace.
        lst = pc.list_slice(
            pc.utf8_split_whitespace(
                pc.utf8_trim_whitespace(
                    pc.utf8_lower(pc.fill_null(t.column("text"), ""))
                )
            ),
            0,
            TITLE_WORDS,
        )
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(offs)
        bg_n = np.maximum(sizes - 1, 0)
        if bg_n.sum() == 0:
            return pa.table(
                {"s": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        # flat index of each bigram's LEFT token (vectorized ragged expand)
        row_of = np.repeat(np.arange(len(sizes)), bg_n)
        within = np.arange(int(bg_n.sum())) - np.repeat(
            np.cumsum(np.r_[0, bg_n[:-1]]), bg_n
        )
        left_ix = np.repeat(offs[:-1], bg_n) + within
        left = lst.values.take(pa.array(left_ix))
        right = lst.values.take(pa.array(left_ix + 1))
        bigram = pc.binary_join_element_wise(left, right, " ")
        # document frequency: count each bigram ONCE per doc (factorize +
        # unique over (row, code) pairs — no Python row loop)
        import pandas as pd

        codes, uniques = pd.factorize(bigram.to_numpy(zero_copy_only=False))
        nc = np.int64(len(uniques))
        uniq_pairs = np.unique(row_of * nc + codes)
        s_codes, df = np.unique(uniq_pairs % nc, return_counts=True)
        svals = np.asarray(uniques)[s_codes]
        order = np.argsort(svals, kind="stable")
        return pa.table(
            {
                "s": pa.array(svals[order], pa.string()),
                "df": pa.array(df[order].astype(np.int64), pa.int64()),
            }
        )

    agg = docs.map_batches(partial, batch_format="pyarrow").groupby("s").sum("df")
    df = agg.to_pandas()  # bounded-cardinality vocabulary table
    df = df.sort_values(["sum(df)", "s"], ascending=[False, True])
    return str(df.iloc[0]["s"])


def q_mf_knn_title_jaccard(sf_dir: str):
    """Field-addressed kNN on the FIRST of two mapped fields: exact Jaccard
    over the title_sig shingle sets, validated against the field mapping at
    plan time (stages/fields.py)."""
    corpus = _mf_corpus(sf_dir)
    out = corpus.knn_sparse("title_sig", np.arange(20, dtype=np.int64), k=5)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_mf_knn_body_cosine(sf_dir: str):
    """Field-addressed kNN on the SECOND mapped field: exact cosine over
    body_emb; the query matrix dims are checked against the mapping before
    any execution is scheduled."""
    corpus = _mf_corpus(sf_dir)
    out = corpus.knn_dense("body_emb", _emb_queries(sf_dir), k=5)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


def q_mf_filtered_title_body(sf_dir: str):
    """Cross-field composition (Q8 over two vector fields): a term filter on
    field A (title_sig contains the corpus's top title bigram — a Lucene
    term-query over the signature set) restricting a cosine kNN on field B
    (body_emb), evaluated in ONE streaming pass over the joined corpus."""
    corpus = _mf_corpus(sf_dir)
    probe = _title_top_bigram(sf_dir)
    mask = corpus.sparse_term_mask("title_sig", probe)
    out = corpus.knn_dense("body_emb", _emb_queries(sf_dir), k=5, mask_fn=mask)
    return out.select_columns(["query_id", "rank", "neighbor_id"])


#: Registry order: every ORACLE_SQL-bearing entry first (DuckDB
#: hash-compared), then the no-oracle entries (rows-only driver check;
#: each carries its own pytest equality/recall/property pin).
QUERIES = {
    # --- oracle-bearing entries (ORACLE_SQL key exists) ---
    "token_counts": q_token_counts,
    "token_counts_regex": q_token_counts_regex,
    "doc_stats": q_doc_stats,
    "docs_by_lang": q_docs_by_lang,
    "sampled_docs": q_sampled_docs,
    "frequent_tokens": q_frequent_tokens,
    "doc_length_deciles": q_doc_length_deciles,
    "exact_dedup_docs": q_exact_dedup_docs,
    "exact_shingle_pairs": q_exact_shingle_pairs,
    "dup_clusters_exact": q_dup_clusters_exact,
    "shingle_posting_histogram": q_shingle_posting_histogram,
    "invalid_docs": q_invalid_docs,
    "jsonl_valid_docs": q_jsonl_valid_docs,
    "jsonl_dead_letter": q_jsonl_dead_letter,
    "quality_counts": q_quality_counts,
    "quality_scores": q_quality_scores,
    "emb_cosine_dup_pairs": q_emb_cosine_dup_pairs,
    "knn_exact_cosine": q_knn_exact_cosine,
    "knn_lsh_cosine_bucketed": q_knn_lsh_cosine_bucketed,
    "knn_exact_l2": q_knn_exact_l2,
    "knn_exact_l1": q_knn_exact_l1,
    "knn_exact_jaccard": q_knn_exact_jaccard,
    "knn_exact_hamming": q_knn_exact_hamming,
    "knn_filtered_cosine": q_knn_filtered_cosine,
    "knn_indexed_cross": q_knn_indexed_cross,
    "rescored_cosine_l2": q_rescored_cosine_l2,
    "mf_knn_title_jaccard": q_mf_knn_title_jaccard,
    "mf_knn_body_cosine": q_mf_knn_body_cosine,
    "mf_filtered_title_body": q_mf_filtered_title_body,
    "perm_hashes": q_perm_hashes,
    # --- relational / windowed oracle entries ---
    "events_first_by_user_type": q_events_first_by_user_type,
    "events_agg": q_events_agg,
    "sessions": q_sessions,
    "events_rolling_1h": q_events_rolling_1h,
    "top_orders_per_customer": q_top_orders_per_customer,
    "customers_without_orders": q_customers_without_orders,
    "doc_length_histogram": q_doc_length_histogram,
    "lineitem_agg": q_lineitem_agg,
    "top_orders": q_top_orders,
    "customer_order_counts": q_customer_order_counts,
    # --- no-oracle entries (rows-only driver check + pytest pins) ---
    "lsh_dup_pairs": q_lsh_dup_pairs,
    "simhash_pairs": q_simhash_pairs,
    "substring_spans": q_substring_spans,
    "substring_spans_ext": q_substring_spans_ext,
    "dedup_decisions": q_dedup_decisions,
    "emb_cosine_lsh_pairs": q_emb_cosine_lsh_pairs,
    "knn_jaccard_lsh": q_knn_jaccard_lsh,
    "knn_hamming_lsh": q_knn_hamming_lsh,
    "knn_lsh_cosine": q_knn_lsh_cosine,
    "knn_lsh_cosine_score_fn": q_knn_lsh_cosine_score_fn,
    "knn_ivf_cosine": q_knn_ivf_cosine,
    "knn_perm_cosine": q_knn_perm_cosine,
    "knn_l2_lsh": q_knn_l2_lsh,
    "emb_l2_lsh_pairs": q_emb_l2_lsh_pairs,
    "lsh_clusters": q_lsh_clusters,
    "simhash_clusters": q_simhash_clusters,
    "substring_dedup_docs": q_substring_dedup_docs,
    "lang_id": q_lang_id,
    "doc_fingerprints": q_doc_fingerprints,
    "image_features": q_image_features,
    "audio_chunks": q_audio_chunks,
    "video_frames": q_video_frames,
    "image_dhash_dups": q_image_dhash_dups,
}

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_TOKS_LOWER = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

def _shingle_cte(k: int) -> str:
    """DuckDB CTE mirroring SignatureStage's k-word shingling for any k."""
    expr = " || ' ' || ".join(
        ["w"] + [f"lead(w,{i}) OVER win" for i in range(1, k)]
    )
    return f"""
d AS (SELECT doc_id, {_TOKS_LOWER} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS rn FROM d),
sh AS (
  SELECT doc_id, {expr} AS s
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY rn)
),
sd AS (SELECT DISTINCT doc_id, s FROM sh WHERE s IS NOT NULL),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sd GROUP BY doc_id),
isec AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS isec
  FROM sd a JOIN sd b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, isec, sa.n AS size_a, sb.n AS size_b
  FROM isec JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
)
"""


_SHINGLE_CTE = _shingle_cte(5)


def _title_shingle_cte(words: int, k: int) -> str:
    """Like _shingle_cte but over each doc's TITLE — its first ``words``
    whitespace tokens — mirroring build_multi_field_corpus's title field."""
    expr = " || ' ' || ".join(["w"] + [f"lead(w,{i}) OVER win" for i in range(1, k)])
    return f"""
d AS (SELECT doc_id, list_slice({_TOKS_LOWER}, 1, {words}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS rn FROM d),
sh AS (
  SELECT doc_id, {expr} AS s
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY rn)
),
sd AS (SELECT DISTINCT doc_id, s FROM sh WHERE s IS NOT NULL),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sd GROUP BY doc_id),
isec AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS isec
  FROM sd a JOIN sd b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b, isec, sa.n AS size_a, sb.n AS size_b
  FROM isec JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
)
"""


_TITLE_CTE = _title_shingle_cte(TITLE_WORDS, TITLE_SHINGLE_K)

#: the sparse-kNN entries shingle at k=3 — the 5-shingle sharing graph of
#: the synthetic corpus is too sparse to exercise real ranking competition.
_SHINGLE_CTE_K3 = _shingle_cte(3)
KNN_SHINGLE_K = 3

ORACLE_SQL = {
    "token_counts": f"SELECT doc_id, length({_TOKS}) AS n_tokens FROM documents",
    "token_counts_regex": r"""
        SELECT doc_id,
               length(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
        FROM documents""",
    "doc_stats": f"""
        SELECT doc_id,
               length({_TOKS}) AS n_tokens,
               CAST(list_aggregate(list_transform({_TOKS}, x -> length(x)), 'sum') AS BIGINT)
                   AS sum_token_len
        FROM documents""",
    "docs_by_lang": """
        SELECT lang, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang""",
    "doc_length_deciles": """
        WITH r AS (
          SELECT n_chars,
                 row_number() OVER (ORDER BY n_chars) - 1 AS rk,
                 COUNT(*) OVER () AS n
          FROM documents),
        d AS (SELECT unnest(range(0, 11)) AS decile)
        SELECT d.decile, r.n_chars
        FROM d JOIN r ON r.rk = d.decile * (r.n - 1) // 10
        QUALIFY row_number() OVER (PARTITION BY d.decile ORDER BY r.rk) = 1""",
    "frequent_tokens": """
        WITH tok AS (
          SELECT DISTINCT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
          FROM documents)
        SELECT token, COUNT(*) AS n_docs FROM tok
        GROUP BY token ORDER BY n_docs DESC, token LIMIT 50""",
    "sampled_docs": """
        SELECT doc_id, n_chars FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 < 214748364""",
    "exact_dedup_docs": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents GROUP BY text""",
    "exact_shingle_pairs": f"WITH {_SHINGLE_CTE} SELECT * FROM pairs",
    "shingle_posting_histogram": f"""
        WITH {_SHINGLE_CTE}
        SELECT cnt AS posting_size, COUNT(*) AS n_shingles
        FROM (SELECT s, COUNT(*) AS cnt FROM sd GROUP BY s)
        GROUP BY cnt""",
    "knn_exact_jaccard": f"""
        WITH {_SHINGLE_CTE_K3},
        dp AS (
          SELECT doc_a AS query_id, doc_b AS neighbor_id, isec,
                 size_a AS qsize, size_b AS nsize
          FROM pairs WHERE doc_a < 20
          UNION ALL
          SELECT doc_b, doc_a, isec, size_b, size_a
          FROM pairs WHERE doc_b < 20
        ),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY CAST(isec AS DOUBLE) / (qsize + nsize - isec)
                                DESC, neighbor_id) AS rank
              FROM dp)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "knn_exact_hamming": f"""
        WITH {_SHINGLE_CTE_K3},
        dp AS (
          SELECT doc_a AS query_id, doc_b AS neighbor_id, isec,
                 size_a AS qsize, size_b AS nsize
          FROM pairs WHERE doc_a < 20
          UNION ALL
          SELECT doc_b, doc_a, isec, size_b, size_a
          FROM pairs WHERE doc_b < 20
        ),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY qsize + nsize - 2 * isec, neighbor_id) AS rank
              FROM dp)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "dup_clusters_exact": f"""
        WITH RECURSIVE {_SHINGLE_CTE},
        edges AS (SELECT doc_a, doc_b FROM pairs WHERE 3*isec >= size_a + size_b),
        bi AS (SELECT doc_a AS a, doc_b AS b FROM edges
               UNION SELECT doc_b, doc_a FROM edges),
        reach(x, y) AS (
          SELECT a, b FROM bi
          UNION
          SELECT r.x, bi.b FROM reach r JOIN bi ON r.y = bi.a
        )
        SELECT x AS doc_id, LEAST(x, MIN(y)) AS cluster_id FROM reach GROUP BY x""",
    "invalid_docs": """
        SELECT doc_id FROM documents
        WHERE text = '' OR lang NOT IN ('en', 'de', 'fr')""",
    "jsonl_valid_docs": """
        SELECT doc_id, length(text) AS nchars, lang FROM documents
        WHERE doc_id % 101 <> 7 AND text <> '' AND lang IN ('en', 'de', 'fr')""",
    "jsonl_dead_letter": """
        SELECT CASE WHEN doc_id % 101 = 7 THEN -1 ELSE doc_id END AS doc_id,
               CASE WHEN doc_id % 101 = 7 THEN 'malformed_json'
                    WHEN text = '' THEN 'empty_text'
                    WHEN lang NOT IN ('en', 'de', 'fr') THEN 'bad_lang'
               END AS reason
        FROM documents
        WHERE doc_id % 101 = 7 OR text = '' OR lang NOT IN ('en', 'de', 'fr')""",
    "knn_exact_l2": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_distance(q.qe, c.embedding) AS dist
              FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "knn_exact_l1": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_aggregate(
                       list_transform(q.qe, (x, i) -> abs(x - c.embedding[i])),
                       'sum') AS dist
              FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "knn_filtered_cosine": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.embedding) AS score
              FROM q, embeddings c
              WHERE c.label = 0 AND c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "quality_counts": f"""
        SELECT doc_id,
               length(text) AS n_chars,
               length({_TOKS}) AS n_tokens,
               length(list_distinct({_TOKS})) AS n_unique_tokens,
               length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_alpha_chars,
               length(regexp_replace(text, '[^\\p{{Nd}}]', '', 'g')) AS n_digit_chars,
               length(regexp_replace(text, '[^\\]\\[\\\\.,;:!?''"(){{}}–—…/-]', '', 'g'))
                   AS n_punct_chars,
               COALESCE(list_max(list_transform({_TOKS}, x -> length(x))), 0)
                   AS max_token_len
        FROM documents""",
    "quality_scores": f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(length(text) AS DOUBLE) AS ncr,
                 CAST(length({_TOKS}) AS DOUBLE) AS nt,
                 CAST(length(list_distinct({_TOKS})) AS DOUBLE) AS nu,
                 CAST(length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS DOUBLE)
                     AS na
          FROM documents),
        d AS (
          SELECT doc_id, nt,
                 GREATEST(ncr, 1) AS nc,
                 na / GREATEST(ncr, 1) AS alpha_frac,
                 CASE WHEN nt > 0 THEN nu / GREATEST(nt, 1) ELSE 0 END AS uniq_frac,
                 GREATEST(ncr, 1) / GREATEST(nt, 1) AS mean_tok
          FROM c),
        s AS (
          SELECT doc_id,
                 LEAST(GREATEST(nt / 50.0, 0), 1)
                   * LEAST(GREATEST((100000 - nt) / 50000.0, 0), 1) AS s_len,
                 LEAST(GREATEST((alpha_frac - 0.5) / 0.3, 0), 1) AS s_alpha,
                 LEAST(GREATEST((uniq_frac - 0.1) / 0.4, 0), 1) AS s_uniq,
                 LEAST(GREATEST((mean_tok - 2.0) / 2.0, 0), 1)
                   * LEAST(GREATEST((12.0 - mean_tok) / 4.0, 0), 1) AS s_tok
          FROM d)
        SELECT doc_id,
               LEAST(GREATEST(s_len * (0.4 * s_alpha + 0.3 * s_uniq
                                       + 0.3 * s_tok), 0), 1) AS score
        FROM s""",
    "perm_hashes": """
        WITH u AS (SELECT vec_id, unnest(embedding) AS v,
                          generate_subscripts(embedding, 1) AS ix
                   FROM embeddings),
        r AS (SELECT vec_id, v, ix,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY abs(v) DESC, ix) AS rn,
                     rank() OVER (PARTITION BY vec_id
                                  ORDER BY abs(v) DESC) AS rk
              FROM u)
        SELECT vec_id,
               CASE WHEN v >= 0 THEN ix ELSE -ix END::BIGINT AS hash,
               CAST(8 - (rk - 1) AS BIGINT) AS freq
        FROM r WHERE rn <= 8""",
    "emb_cosine_dup_pairs": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35""",
    "mf_knn_title_jaccard": f"""
        WITH {_TITLE_CTE},
        dp AS (
          SELECT doc_a AS query_id, doc_b AS neighbor_id, isec,
                 size_a AS qsize, size_b AS nsize
          FROM pairs WHERE doc_a < 20
          UNION ALL
          SELECT doc_b, doc_a, isec, size_b, size_a
          FROM pairs WHERE doc_b < 20
        ),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY CAST(isec AS DOUBLE) / (qsize + nsize - isec)
                                DESC, neighbor_id) AS rank
              FROM dp)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "mf_knn_body_cosine": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.embedding) AS score
              FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "mf_filtered_title_body": f"""
        WITH {_TITLE_CTE},
        probe AS (
          SELECT s FROM (
            SELECT s, COUNT(DISTINCT doc_id) AS df FROM sd GROUP BY s
          ) ORDER BY df DESC, s LIMIT 1
        ),
        corpus AS (SELECT DISTINCT sd.doc_id FROM sd JOIN probe ON sd.s = probe.s),
        q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
              WHERE vec_id < 10),
        sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                      list_cosine_similarity(q.qe, c.embedding) AS score
               FROM q CROSS JOIN embeddings c
               JOIN corpus ON c.vec_id = corpus.doc_id
               WHERE c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM sc)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "knn_indexed_cross": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.embedding) AS score
              FROM q, embeddings c
              WHERE c.label <> 0 AND c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 7""",
    "rescored_cosine_l2": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.embedding) AS cscore,
                     1.0 / (1.0 + list_distance(q.qe, c.embedding)) AS lscore
              FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        up AS (SELECT query_id, neighbor_id, lscore,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cscore DESC, neighbor_id) AS urank
               FROM s),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY lscore DESC, neighbor_id) AS rank
              FROM up WHERE urank <= 20)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "knn_exact_cosine": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                   WHERE vec_id < 10),
        s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.embedding) AS score
              FROM q, embeddings c WHERE c.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, neighbor_id) AS rank
              FROM s)
        SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5""",
    "events_first_by_user_type": """
        SELECT user_id, event_type, event_id AS first_event_id FROM (
          SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn = 1""",
    "sessions": """
        WITH o AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, event_id, ts,
                 CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                     AS session_ix
          FROM o
        )
        SELECT user_id, session_ix, COUNT(*) AS n_events,
               first(event_id ORDER BY ts, event_id) AS first_event_id,
               last(event_id ORDER BY ts, event_id) AS last_event_id
        FROM s GROUP BY user_id, session_ix""",
    "events_rolling_1h": """
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW) AS n_trailing
        FROM events""",
    "top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, rank FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders) WHERE rank <= 3""",
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""",
    "doc_length_histogram": """
        SELECT n_chars // 200 AS bucket, COUNT(*) AS n_docs
        FROM documents GROUP BY 1""",
    "events_agg": """
        SELECT user_id, event_type, COUNT(*) AS n_events,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events GROUP BY user_id, event_type""",
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "top_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "customer_order_counts": """
        SELECT c_custkey, c_name, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name""",
    # lsh_dup_pairs / lsh_clusters: approximate LSH candidate generation is
    # not SQL-expressible → driver records rows-only checks (exactness of the
    # surviving pairs is separately guaranteed by exact_shingle_pairs +
    # tests/test_pipeline.py's brute-force oracle).
    # knn_lsh_cosine_bucketed IS SQL-expressible: its hyperplanes are derived
    # constants, so the oracle recomputes bucket membership from literals.
    "knn_lsh_cosine_bucketed": _lsh_cosine_oracle_sql(),
}

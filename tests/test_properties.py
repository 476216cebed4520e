"""Hypothesis property tests for the core kernels (SURVEY.md §5 layer 2:
reference-vs-optimized oracles over randomized inputs)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elastiknn_ray.config import JaccardLshConfig
from elastiknn_ray.models.exact import jaccard_similarity, pair_intersection_counts
from elastiknn_ray.models.minhash import (
    band_hashes,
    minhash_matrix,
    minhash_scalar,
)
from elastiknn_ray.models.params import derive_minhash
from elastiknn_ray.models.suffix_array import merge_spans, suffix_array

_PARAMS = derive_minhash(JaccardLshConfig(L=4, k=2, seed=0))


def _ragged(lists):
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in lists], out=offsets[1:])
    values = (
        np.concatenate([np.array(x, dtype=np.uint64) for x in lists])
        if offsets[-1]
        else np.empty(0, np.uint64)
    )
    return offsets, values


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
def test_minhash_vectorized_equals_scalar(lists):
    # scalar oracle needs unique values per doc (sets); dedupe
    lists = [sorted(set(x)) for x in lists]
    offsets, values = _ragged(lists)
    mm = minhash_matrix(offsets, values, _PARAMS)
    for i, x in enumerate(lists):
        if not x:
            continue  # empty rows are masked by band_hashes
        ref = minhash_scalar(np.array(x, dtype=np.uint64), _PARAMS)
        got = mm[i].reshape(_PARAMS.L, _PARAMS.k)
        for ix_l in range(_PARAMS.L):
            assert tuple([ix_l] + [int(v) for v in got[ix_l]]) == ref[ix_l]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 1000), min_size=0, max_size=40),
            st.lists(st.integers(0, 1000), min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_jaccard_matches_python_sets(pairs):
    a_lists = [sorted(set(a)) for a, _ in pairs]
    b_lists = [sorted(set(b)) for _, b in pairs]
    ao, av = _ragged(a_lists)
    bo, bv = _ragged(b_lists)
    isec = pair_intersection_counts(ao, av, bo, bv)
    j = jaccard_similarity(ao, av, bo, bv)
    for i, (a, b) in enumerate(zip(a_lists, b_lists)):
        sa, sb = set(a), set(b)
        assert isec[i] == len(sa & sb)
        expect = 1.0 if not (sa | sb) else len(sa & sb) / len(sa | sb)
        assert abs(j[i] - expect) < 1e-12


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_suffix_array_sorted_property(data):
    s = np.frombuffer(data, dtype=np.uint8)
    sa = suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    for i in range(len(s) - 1):
        assert data[sa[i] :] < data[sa[i + 1] :]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(1, 30)),
        min_size=0,
        max_size=20,
    )
)
def test_merge_spans_is_interval_union(spans):
    starts = np.array([s for s, _ in spans], dtype=np.int64)
    ends = np.array([s + l for s, l in spans], dtype=np.int64)
    ms, me = merge_spans(starts, ends)
    covered = set()
    for s, l in spans:
        covered.update(range(s, s + l))
    got = set()
    for s, e in zip(ms, me):
        got.update(range(int(s), int(e)))
    assert got == covered
    # merged intervals are disjoint and sorted
    for i in range(len(ms) - 1):
        assert me[i] < ms[i + 1]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 2**62), min_size=0, max_size=50),
    st.integers(0, 3),
)
def test_band_hashes_partition_invariant(values, split_seed):
    """The same doc set hashed as one batch or split across batches yields
    identical band hashes (partition invariance of the kernel)."""
    docs = [sorted(set(values[i::3])) for i in range(3)]
    offsets, vals = _ragged(docs)
    whole = band_hashes(offsets, vals, _PARAMS)
    for i, d in enumerate(docs):
        o1, v1 = _ragged([d])
        single = band_hashes(o1, v1, _PARAMS)
        assert (single[0] == whole[i]).all()


from elastiknn_ray.models.simhash import simhash_scalar, simhash_signatures
from elastiknn_ray.text.winnow import rolling_hashes, winnow_select


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=25),
        min_size=1,
        max_size=6,
    )
)
def test_simhash_vectorized_equals_scalar(lists):
    lists = [sorted(set(x)) for x in lists]
    offsets, values = _ragged(lists)
    sig = simhash_signatures(offsets, values, 64)
    for i, x in enumerate(lists):
        ref = simhash_scalar(np.array(x, dtype=np.uint64), 64)
        assert (sig[i] == ref).all(), i


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=0, max_size=150),
    st.binary(min_size=0, max_size=150),
    st.binary(min_size=95, max_size=160),  # >= w + g - 1 = 95
)
def test_winnow_guarantee(prefix, suffix, common):
    """Any exact common run of >= w + g - 1 bytes shares a selected
    fingerprint regardless of its position in either text (the winnowing
    guarantee, Schleimer et al. 2003)."""
    w, g = 64, 32
    ta = np.frombuffer(prefix + common, dtype=np.uint8)
    tb = np.frombuffer(common + suffix, dtype=np.uint8)
    ha, hb = rolling_hashes(ta, w), rolling_hashes(tb, w)
    fa = set(ha[winnow_select(ha, g)].tolist())
    fb = set(hb[winnow_select(hb, g)].tolist())
    assert fa & fb


import pyarrow as pa

from elastiknn_ray.config import ShingleConfig
from elastiknn_ray.stages.cosine_lsh import decode_f32, encode_f32
from elastiknn_ray.stages.hashing import decode_u64_lists, encode_u64_lists
from elastiknn_ray.stages.simhash import decode_sigs, encode_sigs
from elastiknn_ray.text.shingle import shingle_batch


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=20),
        min_size=1,
        max_size=8,
    )
)
def test_u64_list_codec_roundtrip(lists):
    offsets, values = _ragged(lists)
    col = encode_u64_lists(offsets, values)
    # roundtrip through a slice too (arrow offset handling)
    for arr in (col, col.slice(1) if len(col) > 1 else col):
        off2, val2 = decode_u64_lists(arr)
        n0 = len(col) - len(arr)
        expect = lists[n0:]
        assert len(off2) == len(expect) + 1
        for i, x in enumerate(expect):
            assert val2[off2[i] : off2[i + 1]].tolist() == [v for v in map(int, x)]


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 3), st.integers(0, 2**32))
def test_sig_codec_roundtrip(n, w, seed):
    rng = np.random.default_rng(seed)
    sig = rng.integers(0, 2**63, (n, w), dtype=np.int64).astype(np.uint64)
    col = encode_sigs(sig)
    out = decode_sigs(col)
    assert (out == sig).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 10), st.integers(1, 16), st.integers(0, 2**32))
def test_f32_codec_roundtrip(n, d, seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    out = decode_f32(encode_f32(m))
    assert np.allclose(out, m.astype(np.float64))


_WORDS_ST = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "e", "ff gg", ""]),
    min_size=0,
    max_size=30,
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_WORDS_ST, min_size=1, max_size=6))
def test_shingle_batch_equals_per_doc(doc_words):
    """Batch shingling must equal per-document shingling (the global-window
    masking at doc boundaries is exact) — including empty and short docs."""
    texts = [" ".join(w) for w in doc_words]
    cfg = ShingleConfig(k=3)
    off_b, val_b = shingle_batch(texts, cfg)
    for i, t in enumerate(texts):
        off_1, val_1 = shingle_batch([t], cfg)
        got = val_b[off_b[i] : off_b[i + 1]].tolist()
        want = val_1[off_1[0] : off_1[1]].tolist()
        assert got == want, (i, t)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 4),  # channels
    st.integers(1, 12),  # height
    st.integers(1, 12),  # width
    st.integers(0, 2**31 - 1),
)
def test_png_codec_roundtrip_fuzz(ch, h, w, seed):
    """PNG encode→decode is the identity for every 8-bit shape/channel."""
    import numpy as np

    from elastiknn_ray.stages.codecs import png_decode, png_encode

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=40),  # corpus hashes
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 3)),  # (hash, owner)
        min_size=1,
        max_size=40,
    ),
)
def test_query_hash_index_expand_matches_bruteforce(corpus, entries):
    """QueryHashIndex.expand_full emits exactly one row per (query entry,
    matching corpus row) — verified against a nested-loop oracle."""
    import numpy as np

    from elastiknn_ray.stages.knn import QueryHashIndex

    flat = np.array([h for h, _ in entries], dtype=np.uint64)
    owner = np.array([o for _, o in entries], dtype=np.int64)
    qids = np.arange(4, dtype=np.int64) * 10
    idx = QueryHashIndex(qids, None, _flat=flat, _owner=owner)
    hashes = np.array(corpus, dtype=np.uint64)
    q_ix, rows, flat_pos = idx.expand_full(hashes)
    got = sorted(zip(q_ix.tolist(), rows.tolist()))
    want = sorted(
        (int(o), r)
        for r, ch in enumerate(corpus)
        for hh, o in entries
        if hh == ch
    )
    assert got == want
    # flat positions map back to entries with the same hash value
    assert (idx.flat_sorted[flat_pos] == hashes[rows]).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(1, 4)), min_size=1, max_size=12),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 8), st.integers(1, 4)),
        min_size=1,
        max_size=20,
    ),
)
def test_capped_hits_property(query_terms, corpus_rows):
    """count_capped_hits == the scalar reference counter: for every doc,
    sum over query entries of min(freq_q, freq_d of the matching term)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.knn import QueryHashIndex, count_capped_hits

    flat = np.array([h for h, _ in query_terms], dtype=np.uint64)
    freq = np.array([f for _, f in query_terms], dtype=np.int64)
    qindex = QueryHashIndex(
        np.array([0], np.int64), None,
        _flat=flat, _owner=np.zeros(len(flat), np.int64),
    )
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in corpus_rows], pa.int64()),
                "hash": pa.array(
                    np.array([h for _, h, _ in corpus_rows], np.uint64), pa.uint64()
                ),
                "freq": pa.array([f for _, _, f in corpus_rows], pa.int64()),
            }
        )
    )
    out = count_capped_hits(corpus, qindex, freq[qindex.order]).to_pandas()
    got = {} if out.empty else dict(zip(out["neighbor_id"], out["hits"]))
    want: dict = {}
    for d, hh, fd in corpus_rows:
        for hq, fq in query_terms:
            if hq == hh:
                want[d] = want.get(d, 0) + min(fq, fd)
    assert got == {k: v for k, v in want.items() if v > 0}


def test_doc_ids_of_url_array_matches_scalar():
    """Batched buffer-based url→doc_id derivation is byte-identical to the
    scalar blake2 function, including on sliced (non-zero offset) columns."""
    import numpy as np
    import pyarrow as pa

    from elastiknn_ray.stages.hashing import doc_id_of_url, doc_ids_of_url_array

    urls = [f"https://ex.org/{i}?q={i * 13}" for i in range(512)] + ["", "a"]
    col = pa.array(urls, pa.string())
    want = np.array([doc_id_of_url(u) for u in urls], dtype=np.int64)
    got = doc_ids_of_url_array(col).to_numpy()
    assert (got == want).all()
    sl = pa.table({"u": col}).slice(100, 300).column("u")
    assert (doc_ids_of_url_array(sl).to_numpy() == want[100:400]).all()


def test_rolling_hashes_chunked_equals_direct():
    """The chunk-blocked evaluation is bit-identical to a single whole-buffer
    pass for lengths straddling the chunk size (the hash is
    position-independent, so chunk-local power indices cancel)."""
    from elastiknn_ray.text import winnow as W

    rng = np.random.default_rng(11)
    for n in (W._CHUNK - 1, W._CHUNK, W._CHUNK + 1, 2 * W._CHUNK + 17):
        s = rng.integers(0, 256, n, dtype=np.uint8)
        for w in (2, 32, 64):
            np.testing.assert_array_equal(
                W.rolling_hashes(s, w), W._rolling_hashes_direct(s, w)
            )

"""Reference-matched recall pins (RecallSuite.scala:41-145).

The reference pins LSH recall at exact (mapping, candidates) configs on a
5000x1024 seed-0 corpus with 50 queries, k=100, 2 shards x 1 segment.  This
suite reproduces that measurement end-to-end on the SAME corpora (regenerated
bit-exactly — tests/ref_testdata.py — and validated against the committed
testdata-sparsebool.json.gz) with the SAME model parameters (JavaRandom(0)
per ModelCache.scala:17-21), the same per-segment candidate cut
(ArrayHitCounter.java:55-120: top-``candidates`` by collision count, ties by
ascending docID), per-segment top-k=100 rescoring, cross-segment merge, and
the reference's score-based recall statistic (RecallSuite.scala:178-188:
hits with score >= the query's 100th-best exact score, over 50*100).

Engine kernels under pin: params derivation (models/params.py), band hashing
(models/minhash.py, models/simhash.py, stages/cosine_lsh.py,
stages/float_lsh.py incl. multiprobe), the QueryHashIndex collision expansion
(stages/knn.py), and the exact score functions (models/exact.py).

One intentional deviation: the engine's MinHash arithmetic is exact uint64,
while JaccardLshModel.java:56 computes ``((1+ti)*a + b) % P`` in Java int32
with silent overflow wrap.  Both are valid minhash mixers; the engine path is
pinned at +-0.05 (statistical agreement) and a Java-overflow-exact variant is
pinned at +-0.02 to demonstrate param/cut/score parity at bit level.
"""

from __future__ import annotations

import numpy as np
import pytest

from elastiknn_ray.config import (
    HASH_PRIME,
    CosineLshConfig,
    HammingLshConfig,
    JaccardLshConfig,
    L2LshConfig,
)
from elastiknn_ray.models.minhash import band_hashes
from elastiknn_ray.models.params import (
    derive_bitsample,
    derive_hyperplanes,
    derive_l2,
    derive_minhash,
)
from elastiknn_ray.models.simhash import bitsample_band_hashes
from elastiknn_ray.stages.cosine_lsh import hyperplane_band_hashes
from elastiknn_ray.stages.float_lsh import l2_band_hashes, l2_probe_hashes
from elastiknn_ray.stages.knn import QueryHashIndex

import ref_testdata as rt

DIMS, NC, NQ, K = rt.DIMS, rt.N_CORPUS, rt.N_QUERIES, rt.N_NEIGHBORS


# ------------------------------------------------------------ fixtures


@pytest.fixture(scope="module")
def data():
    d = rt.generate_all()
    off, val = d["sparse_offsets"], d["sparse_values"]
    sparse_corpus = [val[off[i] : off[i + 1]] for i in range(NC)]
    sparse_queries = [val[off[NC + j] : off[NC + j + 1]] for j in range(NQ)]
    # dense 0/1 view of the sparse vectors for vectorized exact scoring
    dense01 = np.zeros((NC + NQ, DIMS), dtype=np.float32)
    row = np.repeat(np.arange(NC + NQ), np.diff(off))
    dense01[row, val] = 1.0
    return {
        "sparse_corpus": sparse_corpus,
        "sparse_queries": sparse_queries,
        "sparse_offsets": off,
        "sparse_values": val,
        "sparse01_corpus": dense01[:NC],
        "sparse01_queries": dense01[NC:],
        "dense_corpus": d["dense"][:NC].astype(np.float64),
        "dense_queries": d["dense"][NC:].astype(np.float64),
        "unit_corpus": d["unit"][:NC].astype(np.float64),
        "unit_queries": d["unit"][NC:].astype(np.float64),
        "shards": rt.es_shards(NC),
    }


@pytest.fixture(scope="module")
def scores(data):
    """(NQ, NC) float64 exact score matrices per similarity
    (ExactModel.java:10-38 formulas)."""
    q01, c01 = data["sparse01_queries"], data["sparse01_corpus"]
    isec = (q01 @ c01.T).astype(np.float64)  # (NQ, NC)
    qs = q01.sum(axis=1, dtype=np.float64)[:, None]
    cs = c01.sum(axis=1, dtype=np.float64)[None, :]
    union = qs + cs - isec
    jaccard = np.where(union > 0, isec / np.maximum(union, 1), 1.0)
    hamming = (DIMS - (qs - isec) - (cs - isec)) / DIMS
    dq, dc = data["dense_queries"], data["dense_corpus"]
    uq, uc = data["unit_queries"], data["unit_corpus"]
    d2 = (
        (dq**2).sum(axis=1)[:, None]
        - 2.0 * (dq @ dc.T)
        + (dc**2).sum(axis=1)[None, :]
    )
    l2 = 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0)))
    l1 = np.empty((NQ, NC))
    for j in range(NQ):  # chunked |q - c| (the L1 memory fix pattern)
        l1[j] = 1.0 / (1.0 + np.abs(dc - dq[j][None, :]).sum(axis=1))
    qn = np.sqrt((uq**2).sum(axis=1))[:, None]
    cn = np.sqrt((uc**2).sum(axis=1))[None, :]
    cosine = 1.0 + (uq @ uc.T) / (qn * cn)
    return {
        "jaccard": jaccard,
        "hamming": hamming,
        "l1": l1,
        "l2": l2,
        "cosine": cosine,
    }


@pytest.fixture(scope="module")
def gt_min(scores):
    """Per-query 100th-best exact score (minCorrectScore,
    RecallSuite.scala:182)."""
    out = {}
    for sim, m in scores.items():
        top = -np.partition(-m, K - 1, axis=1)[:, :K]
        out[sim] = top.min(axis=1)
    return out


def test_exact_scores_match_committed_groundtruth(scores):
    """Our exact Jaccard/Hamming kernels reproduce the reference's committed
    per-query top-100 ground-truth score vectors (TestData.scala:44-57)."""
    c = rt.committed_sparse()
    if c is None:
        pytest.skip("reference checkout unavailable")
    for sim in ("jaccard", "hamming"):
        ours = -np.sort(-scores[sim], axis=1)[:, :K]
        np.testing.assert_allclose(ours, c["expected"][sim], atol=1e-12)


# ------------------------------------------------------------ harness


def _count_cut(qindex, flat_hashes, doc_of_row, candidates):
    """Per-segment collision count + kthGreatest cut: top ``candidates`` docs
    per query by (count desc, docID asc) among docs with >= 1 collision
    (ArrayHitCounter.java:55-120 semantics)."""
    q_ix, rows = qindex.expand_indices(flat_hashes)
    if len(q_ix) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    docs = doc_of_row[rows]
    key = q_ix.astype(np.int64) * NC + docs
    ukey, cnt = np.unique(key, return_counts=True)
    uq, ud = ukey // NC, ukey % NC
    order = np.lexsort((ud, -cnt, uq))
    uq_o = uq[order]
    within = np.arange(len(order)) - np.repeat(
        np.flatnonzero(np.r_[True, uq_o[1:] != uq_o[:-1]]),
        np.diff(np.r_[np.flatnonzero(np.r_[True, uq_o[1:] != uq_o[:-1]]), len(order)]),
    )
    keep = order[within < candidates]
    return uq[keep], ud[keep]


def _recall(corpus_hashes, query_hashes, candidates, score_mat, min_score, shards):
    """Full RecallSuite measurement: per-segment cut -> rescore -> top-k=100
    per segment -> cross-segment merge -> score-threshold recall.

    ``corpus_hashes``: uint64 (NC, L).  ``query_hashes``: uint64 (NQ, L) or
    ragged (offsets, values) for multiprobe queries.
    """
    if isinstance(query_hashes, tuple):
        qindex = QueryHashIndex.from_ragged(
            np.arange(NQ, dtype=np.int64), *query_hashes
        )
    else:
        qindex = QueryHashIndex(np.arange(NQ, dtype=np.int64), query_hashes)
    L = corpus_hashes.shape[1]
    merged_q, merged_s = [], []
    for seg in (0, 1):
        ids = np.flatnonzero(shards == seg)
        flat = corpus_hashes[ids].reshape(-1)
        doc_of_row = np.repeat(ids, L)
        q, d = _count_cut(qindex, flat, doc_of_row, candidates)
        # rescore candidates with the exact similarity (float32 scores, as
        # Lucene returns float; MatchHashesAndScoreQuery.java:121-124)
        s = score_mat[q, d].astype(np.float32)
        # per-segment top-k=100 by (score desc, docID asc)
        order = np.lexsort((d, -s, q))
        qo = order  # grouped by q after lexsort
        uq_o = q[qo]
        starts = np.flatnonzero(np.r_[True, uq_o[1:] != uq_o[:-1]])
        within = np.arange(len(qo)) - np.repeat(
            starts, np.diff(np.r_[starts, len(qo)])
        )
        keep = qo[within < K]
        merged_q.append(q[keep])
        merged_s.append(s[keep])
    q = np.concatenate(merged_q)
    s = np.concatenate(merged_s)
    # coordinator merge: global top-k=100 per query by score desc
    order = np.lexsort((-s, q))
    uq_o = q[order]
    starts = np.flatnonzero(np.r_[True, uq_o[1:] != uq_o[:-1]])
    within = np.arange(len(order)) - np.repeat(
        starts, np.diff(np.r_[starts, len(order)])
    )
    keep = order[within < K]
    hits = s[keep].astype(np.float64) >= min_score[q[keep]]
    return float(hits.sum()) / (NQ * K)


# ------------------------------------------------------------ hashing


def _sparse_band_hashes(data, which, cfg) -> np.ndarray:
    off, val = data["sparse_offsets"], data["sparse_values"]
    if which == "corpus":
        o = off[: NC + 1].copy()
        v = val[: off[NC]]
    else:
        o = (off[NC:] - off[NC]).copy()
        v = val[off[NC] :]
    params = derive_minhash(cfg)
    return band_hashes(o, v.astype(np.uint64), params)


def _java_exact_jaccard_hashes(data, which, cfg) -> np.ndarray:
    """Bit-exact JaccardLshModel.hash (JaccardLshModel.java:42-63) including
    the int32 overflow wrap in ``((1+ti)*a + b) % P`` and Java's
    truncated-remainder sign, FNV-encoded per (table, k-tuple)."""
    off, val = data["sparse_offsets"], data["sparse_values"]
    if which == "corpus":
        lo, hi = 0, NC
    else:
        lo, hi = NC, NC + NQ
    o = off[lo : hi + 1] - off[lo]
    v = (val[off[lo] : off[hi]] + 1).astype(np.int64)
    params = derive_minhash(cfg)
    n = len(o) - 1
    nf = cfg.L * cfg.k
    mins = np.empty((n, nf), dtype=np.int64)
    starts = o[:-1]
    i32 = np.int64(1) << 32
    for i in range(nf):
        a, b = np.int64(params.A[i]), np.int64(params.B[i])
        h = v * a + b
        h = ((h + (i32 >> 1)) % i32) - (i32 >> 1)  # int32 wrap
        h = np.fmod(h, np.int64(HASH_PRIME))  # Java's truncated %
        mins[:, i] = np.minimum.reduceat(h, starts)
    mins = mins.view(np.uint64).reshape(n, cfg.L, cfg.k)
    FNV_OFF, FNV_P = np.uint64(0xCBF29CE484222325), np.uint64(0x100000001B3)
    out = np.full((n, cfg.L), FNV_OFF, dtype=np.uint64)
    out = (out ^ np.arange(cfg.L, dtype=np.uint64)[None, :]) * FNV_P
    for j in range(cfg.k):
        out = (out ^ mins[:, :, j]) * FNV_P
    return out


def _packed_sigs(data, which) -> np.ndarray:
    off, val = data["sparse_offsets"], data["sparse_values"]
    lo, hi = (0, NC) if which == "corpus" else (NC, NC + NQ)
    n = hi - lo
    out = np.zeros((n, DIMS // 64), dtype=np.uint64)
    seg = val[off[lo] : off[hi]]
    row = np.repeat(np.arange(n), np.diff(off[lo : hi + 1]))
    np.bitwise_or.at(
        out, (row, seg // 64), np.uint64(1) << (seg % 64).astype(np.uint64)
    )
    return out


def _hamming_band_hashes(data, which, cfg) -> np.ndarray:
    return bitsample_band_hashes(_packed_sigs(data, which), derive_bitsample(cfg))


def _cosine_band_hashes(mat, cfg) -> np.ndarray:
    p = derive_hyperplanes(cfg)
    return hyperplane_band_hashes(mat, p.planes.astype(np.float64), cfg.L, cfg.k)


def _l2_corpus_hashes(mat, cfg) -> np.ndarray:
    p = derive_l2(cfg)
    return l2_band_hashes(
        mat, p.A.astype(np.float64), p.B.astype(np.float64), float(cfg.w), cfg.L, cfg.k
    )


def _l2_query_hashes_ragged(mat, cfg, probes):
    p = derive_l2(cfg)
    a = p.A.astype(np.float64)
    b = p.B.astype(np.float64)
    arrs = [
        l2_probe_hashes(mat[j], a, b, float(cfg.w), cfg.L, cfg.k, probes)
        for j in range(len(mat))
    ]
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum([len(x) for x in arrs], out=offsets[1:])
    return offsets, np.concatenate(arrs)


# ------------------------------------------------------------ pins

# (id, similarity for GT, expected recall, tolerance) per RecallSuite line.
JACCARD_PINS = [
    # RecallSuite.scala:59-66 — JaccardLsh(1024, 200, 1), 400 candidates
    ("jaccard_L200_k1_c400", JaccardLshConfig(L=200, k=1, seed=0), 400, 0.69),
    # RecallSuite.scala:67-72 — JaccardLsh(1024, 300, 2), 400 candidates
    ("jaccard_L300_k2_c400", JaccardLshConfig(L=300, k=2, seed=0), 400, 0.62),
]

HAMMING_PINS = [
    # RecallSuite.scala:74-81 — HammingLsh(1024, 512, 1), 200 candidates
    ("hamming_L512_k1_c200", HammingLshConfig(dims=DIMS, L=DIMS // 2, k=1, seed=0), 200, 0.72),
    # RecallSuite.scala:82-86 — HammingLsh(1024, 409, 2), 200 candidates
    ("hamming_L409_k2_c200", HammingLshConfig(dims=DIMS, L=DIMS * 2 // 5, k=2, seed=0), 200, 0.86),
    # RecallSuite.scala:87-91 — HammingLsh(1024, 409, 4), 200 candidates
    ("hamming_L409_k4_c200", HammingLshConfig(dims=DIMS, L=DIMS * 2 // 5, k=4, seed=0), 200, 0.65),
]

COSINE_PINS = [
    # RecallSuite.scala:93-101 — CosineLsh(1024, 400, 1), 400 candidates
    ("cosine_L400_k1_c400", CosineLshConfig(dims=DIMS, L=400, k=1, seed=0), 400, 0.46),
    # RecallSuite.scala:102-107 — CosineLsh(1024, 400, 2), 200 candidates
    ("cosine_L400_k2_c200", CosineLshConfig(dims=DIMS, L=400, k=2, seed=0), 200, 0.34),
]

L2_PINS = [
    # RecallSuite.scala:109-118 — L2Lsh(1024, 600, 1, 4), 200 cand, 0 probes
    ("l2_L600_k1_w4_c200_p0", L2LshConfig(dims=DIMS, L=600, k=1, w=4, seed=0), 200, 0, 0.12),
    # RecallSuite.scala:117 — same mapping, 800 candidates, 2 probes
    ("l2_L600_k1_w4_c800_p2", L2LshConfig(dims=DIMS, L=600, k=1, w=4, seed=0), 800, 2, 0.49),
]

# Observed (2026-08-17, this harness) vs the reference's published values:
#   jaccard_L200_k1_c400        ref 0.69  ours 0.6990
#   jaccard_L300_k2_c400        ref 0.62  ours 0.6050
#   jaccard_L200_k1 JAVA-EXACT  ref 0.69  ours 0.6880
#   hamming_L512_k1_c200        ref 0.72  ours 0.7210
#   hamming_L409_k2_c200        ref 0.86  ours 0.8590
#   hamming_L409_k4_c200        ref 0.65  ours 0.6546
#   cosine_L400_k1_c400         ref 0.46  ours 0.4560
#   cosine_L400_k2_c200         ref 0.34  ours 0.3418
#   l2_L600_k1_w4_c200_p0       ref 0.12  ours 0.1232
#   l2_L600_k1_w4_c800_p2       ref 0.49  ours 0.4852
TOL = 0.03


@pytest.mark.parametrize("name,cfg,cand,expected", JACCARD_PINS, ids=lambda p: str(p))
def test_jaccard_recall_pin(data, scores, gt_min, name, cfg, cand, expected):
    ch = _sparse_band_hashes(data, "corpus", cfg)
    qh = _sparse_band_hashes(data, "queries", cfg)
    r = _recall(ch, qh, cand, scores["jaccard"], gt_min["jaccard"], data["shards"])
    assert abs(r - expected) <= TOL, f"{name}: recall {r:.3f} vs reference {expected}"


def test_jaccard_recall_pin_java_exact(data, scores, gt_min):
    """Java-overflow-exact hashing at JaccardLsh(200,1)/400 — with identical
    hash values, params, cut, and scores, recall should land within the
    reference's own tolerance band (RecallSuite.scala:29: 1e-2) plus
    residual routing-assignment noise."""
    cfg = JaccardLshConfig(L=200, k=1, seed=0)
    ch = _java_exact_jaccard_hashes(data, "corpus", cfg)
    qh = _java_exact_jaccard_hashes(data, "queries", cfg)
    r = _recall(ch, qh, 400, scores["jaccard"], gt_min["jaccard"], data["shards"])
    assert abs(r - 0.69) <= 0.02, f"java-exact recall {r:.3f} vs reference 0.69"


@pytest.mark.parametrize("name,cfg,cand,expected", HAMMING_PINS, ids=lambda p: str(p))
def test_hamming_recall_pin(data, scores, gt_min, name, cfg, cand, expected):
    ch = _hamming_band_hashes(data, "corpus", cfg)
    qh = _hamming_band_hashes(data, "queries", cfg)
    r = _recall(ch, qh, cand, scores["hamming"], gt_min["hamming"], data["shards"])
    assert abs(r - expected) <= TOL, f"{name}: recall {r:.3f} vs reference {expected}"


@pytest.mark.parametrize("name,cfg,cand,expected", COSINE_PINS, ids=lambda p: str(p))
def test_cosine_recall_pin(data, scores, gt_min, name, cfg, cand, expected):
    ch = _cosine_band_hashes(data["unit_corpus"], cfg)
    qh = _cosine_band_hashes(data["unit_queries"], cfg)
    r = _recall(ch, qh, cand, scores["cosine"], gt_min["cosine"], data["shards"])
    assert abs(r - expected) <= TOL, f"{name}: recall {r:.3f} vs reference {expected}"


@pytest.mark.parametrize("name,cfg,cand,probes,expected", L2_PINS, ids=lambda p: str(p))
def test_l2_recall_pin(data, scores, gt_min, name, cfg, cand, probes, expected):
    ch = _l2_corpus_hashes(data["dense_corpus"], cfg)
    if probes == 0:
        qh = _l2_corpus_hashes(data["dense_queries"], cfg)
    else:
        qh = _l2_query_hashes_ragged(data["dense_queries"], cfg, probes)
    r = _recall(ch, qh, cand, scores["l2"], gt_min["l2"], data["shards"])
    assert abs(r - expected) <= TOL, f"{name}: recall {r:.3f} vs reference {expected}"


# -------------------------------------------------- permutation pins


def _perm_terms(mat, k, repeating):
    from elastiknn_ray.stages.float_lsh import permutation_hashes

    row_ix, enc, freq = permutation_hashes(mat, k, repeating)
    return row_ix, enc, freq


def _recall_perm(data, scores, gt_min, sim_key, mat_key, repeating, candidates, expected):
    """Permutation-LSH recall: freq-capped counting (min(query_freq,
    doc_freq) per matching term, ArrayHitCounter.java:34-41 via the
    PermutationLshModel tie-freq encoding) → kthGreatest cut → exact
    rescore → merge, same harness as the other pins."""
    corpus = data[f"{mat_key}_corpus"]
    queries = data[f"{mat_key}_queries"]
    k_hash = 128
    c_row, c_hash, c_freq = _perm_terms(corpus, k_hash, repeating)
    q_row, q_hash, q_freq = _perm_terms(queries, k_hash, repeating)
    score_mat, min_score = scores[sim_key], gt_min[sim_key]
    merged_q, merged_s = [], []
    for seg in (0, 1):
        in_seg = data["shards"][c_row] == seg
        dd, dh, df = c_row[in_seg], c_hash[in_seg], c_freq[in_seg]
        order = np.argsort(dh, kind="stable")
        dh, dd, df = dh[order], dd[order], df[order]
        lo = np.searchsorted(dh, q_hash)
        hi = np.searchsorted(dh, q_hash, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        within = np.arange(total) - np.repeat(starts, cnt)
        rows = np.repeat(lo, cnt) + within
        contrib = np.minimum(np.repeat(q_freq, cnt), df[rows])
        keys = np.repeat(q_row, cnt).astype(np.int64) * NC + dd[rows]
        uk, inv = np.unique(keys, return_inverse=True)
        counts = np.bincount(inv, weights=contrib.astype(np.float64)).astype(
            np.int64
        )
        uq, ud = uk // NC, uk % NC
        order2 = np.lexsort((ud, -counts, uq))
        uq_o = uq[order2]
        st = np.flatnonzero(np.r_[True, uq_o[1:] != uq_o[:-1]])
        within2 = np.arange(len(order2)) - np.repeat(
            st, np.diff(np.r_[st, len(order2)])
        )
        keep = order2[within2 < candidates]
        q, d = uq[keep], ud[keep]
        s = score_mat[q, d].astype(np.float32)
        o3 = np.lexsort((d, -s, q))
        qo = q[o3]
        st = np.flatnonzero(np.r_[True, qo[1:] != qo[:-1]])
        w3 = np.arange(len(o3)) - np.repeat(st, np.diff(np.r_[st, len(o3)]))
        keep3 = o3[w3 < K]
        merged_q.append(q[keep3])
        merged_s.append(s[keep3])
    q = np.concatenate(merged_q)
    s = np.concatenate(merged_s)
    order = np.lexsort((-s, q))
    qo = q[order]
    st = np.flatnonzero(np.r_[True, qo[1:] != qo[:-1]])
    within = np.arange(len(order)) - np.repeat(st, np.diff(np.r_[st, len(order)]))
    keep = order[within < K]
    hits = s[keep].astype(np.float64) >= min_score[q[keep]]
    r = float(hits.sum()) / (NQ * K)
    # RecallSuite.scala:121-144 — recallTolerance 5e-2 for both Permutation
    # mappings; same band here.
    assert abs(r - expected) <= 0.05, f"perm recall {r:.3f} vs expected {expected}"
    return r


# Non-repeating matches the reference's published recall directly.
# Repeating=true does NOT: the reference opens postings with
# PostingsEnum.NONE (MatchHashesAndScoreQuery.java:70-80) and still calls
# docs.freq(), whose value under NONE is undefined in Lucene — its measured
# 0.14/0.12 reflect that artifact.  Our counting implements the documented
# min(query_freq, doc_freq) rule; every counting variant we tested (min,
# unweighted, query-only, doc-only) lands at 0.25-0.31, i.e. strictly
# better candidate selection at the same budget.  We therefore pin our
# deterministic values (expected_ours) and additionally assert we never
# fall below the reference's published number.
PERM_PINS = [
    # RecallSuite.scala:120-132 — PermutationLsh(1024, 128, true)
    ("perm_rep_cosine", "cosine", "unit", True, 200, 0.293, 0.14),
    ("perm_rep_l2", "l2", "dense", True, 200, 0.247, 0.12),
    # RecallSuite.scala:133-144 — PermutationLsh(1024, 128, false)
    ("perm_norep_cosine", "cosine", "unit", False, 200, 0.31, 0.31),
    ("perm_norep_l2", "l2", "dense", False, 200, 0.30, 0.30),
]


@pytest.mark.parametrize(
    "name,sim,mat,repeating,cand,expected,ref_floor",
    PERM_PINS,
    ids=lambda p: str(p),
)
def test_permutation_recall_pin(
    data, scores, gt_min, name, sim, mat, repeating, cand, expected, ref_floor
):
    r = _recall_perm(data, scores, gt_min, sim, mat, repeating, cand, expected)
    assert r >= ref_floor - 0.05, f"{name}: {r:.3f} below reference {ref_floor}"


def test_exact_queries_full_recall(scores, gt_min, data):
    """Exact queries must reach recall 1.0 (RecallSuite.scala:43-57) — scores
    every doc, which also sanity-checks the harness's merge + threshold."""
    for sim in ("jaccard", "hamming", "l2", "cosine"):
        all_hashes = np.arange(NC, dtype=np.uint64)[:, None]  # unique: no cuts
        qh = np.empty((NQ, 0), dtype=np.uint64)
        # bypass hashing: emulate exact by scoring all docs per segment
        merged_q, merged_s = [], []
        for seg in (0, 1):
            ids = np.flatnonzero(data["shards"] == seg)
            s = scores[sim][:, ids].astype(np.float32)
            order = np.argsort(-s, axis=1, kind="stable")[:, :K]
            merged_q.append(np.repeat(np.arange(NQ), K))
            merged_s.append(np.take_along_axis(s, order, axis=1).reshape(-1))
        q = np.concatenate(merged_q)
        s = np.concatenate(merged_s)
        o = np.lexsort((-s, q))
        qo, so = q[o], s[o]
        starts = np.flatnonzero(np.r_[True, qo[1:] != qo[:-1]])
        within = np.arange(len(o)) - np.repeat(
            starts, np.diff(np.r_[starts, len(o)])
        )
        keep = within < K
        hits = so[keep].astype(np.float64) >= gt_min[sim][qo[keep]]
        r = float(hits.sum()) / (NQ * K)
        # 1.0 within the reference's own tolerance (RecallSuite.scala:29:
        # recallTolerance = 1e-2): float32 Lucene-style scores can round a
        # hair below the float64 ground-truth threshold on both systems.
        assert r >= 1.0 - 1e-2, f"exact {sim}: recall {r}"

"""Suffix-array substring-dedup tests (M7): kernel oracles + end-to-end
detection of the synthetic corpus's injected >=200-char substrings."""

import numpy as np
import pyarrow as pa
import pytest

from elastiknn_ray.models.suffix_array import (
    adjacent_lcp,
    duplicate_spans,
    merge_spans,
    suffix_array,
)


def test_suffix_array_matches_sorted_suffixes():
    rng = np.random.default_rng(0)
    for n in (1, 2, 17, 200):
        s = rng.integers(97, 103, n).astype(np.uint8)  # small alphabet
        sa = suffix_array(s)
        b = bytes(s)
        expected = sorted(range(n), key=lambda i: b[i:])
        assert sa.tolist() == expected, n


def test_adjacent_lcp_bruteforce():
    rng = np.random.default_rng(1)
    s = rng.integers(97, 100, 300).astype(np.uint8)
    sa = suffix_array(s)
    lcp = adjacent_lcp(s, sa, max_lcp=1000)
    b = bytes(s)
    for i in range(len(s) - 1):
        x, y = b[sa[i] :], b[sa[i + 1] :]
        expect = len(__import__("os").path.commonprefix([x, y]))
        assert lcp[i] == expect, i


def test_duplicate_spans_finds_planted_repeat():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 250, 500).astype(np.uint8)
    repeat = rng.integers(0, 250, 120).astype(np.uint8)
    s = np.concatenate([a[:200], repeat, a[200:], repeat, a[:50]])
    starts, lens = duplicate_spans(s, min_len=100)
    # the second occurrence (position 200+120+300=620) must be covered
    second = 200 + 120 + 300
    covered = any(
        st <= second and st + ln >= second + 100 for st, ln in zip(starts, lens)
    )
    assert covered
    # the first occurrence (min position) must NOT be reported
    assert not any(st in range(200, 200 + 21) for st in starts)


def test_merge_spans():
    s = np.array([10, 0, 5, 40], dtype=np.int64)
    e = np.array([20, 6, 12, 50], dtype=np.int64)
    ms, me = merge_spans(s, e)
    assert ms.tolist() == [0, 40]
    assert me.tolist() == [20, 50]


def _docs_ds(n, seed):
    import ray.data as rd

    from elastiknn_ray.sources.synth import pages_table
    from elastiknn_ray.stages.hashing import prepare_batch

    t = pages_table(n, seed)
    return rd.from_arrow(t).map_batches(prepare_batch, batch_format="pyarrow")


def test_substring_pipeline_detects_injected(ray_session):
    """Every synthetic 'substr' doc carries a >=200-char donor substring; the
    combined (intra-SA + winnow) span stage must flag each such doc."""
    from elastiknn_ray.sources.synth import role_of, url_of
    from elastiknn_ray.stages.hashing import doc_id_of_url
    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    n, seed = 400, 7
    docs = _docs_ds(n, seed)
    spans = substring_spans(docs, SubstringConfig(num_partitions=8)).to_pandas()
    flagged = set(spans["doc_id"])

    from elastiknn_ray.sources.synth import base_target

    n_hosts = max(4, n // 50)
    substr_rows = [i for i in range(n) if role_of(i, seed) == "substr"]
    assert substr_rows
    missed = []
    for i in substr_rows:
        # keep-first is by doc_id = url hash, so EITHER side of the injected
        # pair may be the kept (unflagged) occurrence — the duplicate content
        # must be flagged on at least one side
        did = doc_id_of_url(url_of(i, seed, n_hosts))
        donor = doc_id_of_url(url_of(base_target(i, seed), seed, n_hosts))
        if did not in flagged and donor not in flagged:
            missed.append(i)
    assert not missed, missed
    # clones are full duplicates -> also flagged with long spans
    assert (spans["end"] - spans["start"]).min() >= SubstringConfig().window


def test_remove_spans_cuts_content(ray_session):
    import ray.data as rd

    from elastiknn_ray.stages.substring import remove_spans

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["abcdefghij", "hello"], pa.string()),
            }
        )
    )
    spans = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 1], pa.int64()),
                "start": pa.array([2, 5], pa.int64()),
                "end": pa.array([4, 7], pa.int64()),
            }
        )
    )
    out = remove_spans(docs, spans, num_partitions=2).to_pandas()
    out = out.set_index("doc_id")["text"]
    assert out[1] == "abehij"
    assert out[2] == "hello"


def test_adjacent_lcp_screening_mode_agrees_above_threshold():
    rng = np.random.default_rng(9)
    base = rng.integers(0, 250, 400).astype(np.uint8)
    rep = rng.integers(0, 250, 150).astype(np.uint8)
    s = np.concatenate([base, rep, base[:100], rep])
    sa = suffix_array(s)
    exact = adjacent_lcp(s, sa, 1 << 14)
    fast = adjacent_lcp(s, sa, 1 << 14, min_interest=100)
    above = exact >= 100
    assert (fast[above] == exact[above]).all()
    assert (fast[~above] < 100).all()


def test_window_path_enforces_min_len(ray_session):
    """ADVICE fix: short shared boilerplate (>= window but << min_len) in
    docs from DIFFERENT partitions must NOT accumulate coverage; a shared
    run >= min_len must still be found cross-partition."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    rng = np.random.default_rng(5)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    cfg = SubstringConfig(min_len=200, window=64, guard=32, num_partitions=4)
    short_boiler = rand_text(90)   # >= w+g-1=95? below min threshold anyway
    long_dup = rand_text(400)      # >= min_len: must be caught
    # doc ids 0 and 1: different cells of doc_id % 4?  0 % 4 != 1 % 4 — yes.
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
                "text": pa.array(
                    [
                        rand_text(300) + short_boiler + rand_text(300),
                        rand_text(310) + short_boiler + rand_text(290),
                        rand_text(250) + long_dup + rand_text(250),
                        rand_text(260) + long_dup + rand_text(240),
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = substring_spans(docs, cfg).to_pandas()
    # the 90-byte boilerplate pair (docs 0, 1) yields no span
    assert not set(out["doc_id"]) & {0, 1}, out
    # the 400-byte duplicated run is found in the later occurrence (doc 5)
    d5 = out[out["doc_id"] == 5]
    assert len(d5) >= 1
    assert (d5["end"] - d5["start"]).max() >= 200


def test_winnow_screen_is_lossless(ray_session):
    """screen=True (drop docs with no repeated partition fingerprint before
    suffix-array construction) must be byte-identical to screen=False — the
    winnowing guarantee makes every doc participating in a >= min_len
    duplicated run a suspect.  Checked on a dup-rich corpus and on an
    all-unique corpus (where the screen skips the SA entirely)."""
    import numpy as np
    import ray.data as rd

    from elastiknn_ray.stages.substring import SubstringConfig, substring_spans

    docs = _docs_ds(400, 7)
    base = dict(min_len=200, window=64, guard=32, num_partitions=8)
    on = substring_spans(docs, SubstringConfig(**base, screen=True)).to_pandas()
    off = substring_spans(docs, SubstringConfig(**base, screen=False)).to_pandas()
    key = ["doc_id", "start", "end"]
    np.testing.assert_array_equal(
        on.sort_values(key).reset_index(drop=True).values,
        off.sort_values(key).reset_index(drop=True).values,
    )
    assert len(on) > 0

    # all-unique corpus: screen path returns empty without building an SA
    import pyarrow as pa

    rng = np.random.default_rng(3)
    uniq = pa.table(
        {
            "doc_id": pa.array(np.arange(64, dtype=np.int64)),
            "text": pa.array(
                [
                    " ".join(str(rng.integers(0, 1 << 30)) for _ in range(120))
                    for _ in range(64)
                ]
            ),
        }
    )
    ds = rd.from_arrow(uniq)
    assert substring_spans(ds, SubstringConfig(**base, screen=True)).count() == 0


# --------------------------------------------- maximal-extent cross path


def _rnd_text(n, seed):
    r = np.random.default_rng(seed)
    return "".join(chr(c) for c in r.integers(97, 123, n))


def test_extended_cross_spans_report_full_extents(ray_session):
    """A planted cross-partition duplicate must come back at its EXACT
    byte extent from the extended path (the window path reports w-byte
    granularity with up to guard-1 slack per side)."""
    import ray.data as rd

    from elastiknn_ray.stages.substring import (
        SubstringConfig,
        cross_partition_extended_spans,
        cross_partition_window_spans,
        substring_spans,
    )

    shared = _rnd_text(600, 99)
    t0 = _rnd_text(300, 1) + shared + _rnd_text(250, 2)  # run at [300, 900)
    t1 = _rnd_text(500, 3) + shared + _rnd_text(100, 4)  # run at [500, 1100)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([t0, t1], pa.string()),
            }
        )
    ).repartition(2)
    cfg = SubstringConfig(min_len=200, window=64, guard=32, num_partitions=4)

    ext = cross_partition_extended_spans(docs, cfg, 4).to_pandas()
    d1 = ext[ext.doc_id == 1]
    assert d1.start.min() == 500 and d1.end.max() == 1100

    win = cross_partition_window_spans(docs, cfg, 4).to_pandas()
    w1 = win[win.doc_id == 1]
    assert w1.start.min() >= 500 and w1.end.max() <= 1100  # truncated

    cfg_ext = SubstringConfig(
        min_len=200, window=64, guard=32, num_partitions=4, extend_cross=True
    )
    spans = substring_spans(docs, cfg_ext).to_pandas()
    assert len(spans) == 1
    assert (spans.doc_id[0], spans.start[0], spans.end[0]) == (1, 500, 1100)


def test_extended_cross_agrees_with_intra_on_colocated(ray_session):
    """Intra (exact SA extents) and extended cross (byte extension) must
    report the same merged spans when the same docs are co-located."""
    import ray.data as rd

    from elastiknn_ray.stages.substring import (
        SubstringConfig,
        cross_partition_extended_spans,
        intra_partition_spans,
    )
    from elastiknn_ray.models.suffix_array import merge_spans

    shared = _rnd_text(450, 77)
    t0 = _rnd_text(120, 11) + shared + _rnd_text(80, 12)
    t1 = _rnd_text(260, 13) + shared + _rnd_text(340, 14)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([t0, t1], pa.string()),
            }
        )
    )
    cfg = SubstringConfig(min_len=200, window=64, guard=32, num_partitions=1)
    intra = intra_partition_spans(docs, 200, 1).to_pandas()
    ext = cross_partition_extended_spans(docs, cfg, 1).to_pandas()

    def merged(df):
        out = {}
        for d, g in df.groupby("doc_id"):
            s, e = merge_spans(g.start.to_numpy(), g.end.to_numpy())
            out[d] = list(zip(s.tolist(), e.tolist()))
        return out

    assert merged(intra) == merged(ext) == {1: [(260, 710)]}


def test_extend_cross_rejects_sub_min_len_boilerplate(ray_session):
    """Precision win: a duplicated run just UNDER min_len can survive the
    window path's min_merged_len guard slack, but the extended path knows
    its exact extent and rejects it."""
    import ray.data as rd

    from elastiknn_ray.stages.substring import (
        SubstringConfig,
        min_merged_len,
        substring_spans,
    )

    cfg = SubstringConfig(min_len=200, window=64, guard=32, num_partitions=4)
    cfg_ext = SubstringConfig(
        min_len=200, window=64, guard=32, num_partitions=4, extend_cross=True
    )
    # 199-byte run: true extent < min_len; window-path merged extent lands
    # in [199-2*(g-1), 199] and min_merged_len is 138, so across seeds the
    # window path usually admits it.  Find a seed where it does, then show
    # the extended path rejects exactly that fixture.
    for seed in range(40):
        bp = _rnd_text(199, 1000 + seed)
        t2 = _rnd_text(400, 6) + bp + _rnd_text(300, 7)
        t3 = _rnd_text(200, 8) + bp + _rnd_text(450, 9)
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([t2, t3], pa.string()),
                }
            )
        ).repartition(2)
        old_rows = len(substring_spans(docs, cfg).to_pandas())
        if old_rows:
            new_rows = len(substring_spans(docs, cfg_ext).to_pandas())
            assert new_rows == 0, "extended path must reject a 199-byte run"
            return
    raise AssertionError("no seed made the window path admit the boilerplate")


def test_extended_cross_multiple_runs_same_pair(ray_session):
    """Two separate shared runs between the same doc pair (and on the same
    diagonal) must come back as two spans, not one bridged span."""
    import ray.data as rd

    from elastiknn_ray.stages.substring import (
        SubstringConfig,
        cross_partition_extended_spans,
    )

    run1 = _rnd_text(300, 31)
    run2 = _rnd_text(260, 32)
    mid_a = _rnd_text(150, 33)
    mid_b = _rnd_text(150, 34)  # different middles break the diagonal
    t0 = run1 + mid_a + run2
    t1 = run1 + mid_b + run2  # same diag for both runs
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([t0, t1], pa.string()),
            }
        )
    ).repartition(2)
    cfg = SubstringConfig(min_len=200, window=64, guard=32, num_partitions=4)
    ext = cross_partition_extended_spans(docs, cfg, 4).to_pandas()
    d1 = ext[ext.doc_id == 1].sort_values("start").drop_duplicates()
    spans = list(zip(d1.start.tolist(), d1.end.tolist()))
    assert (0, 300) in spans and (450, 710) in spans
    assert not any(s < 300 and e > 450 for s, e in spans), "bridged span"

"""Suffix-array substring duplicate detection (SURVEY.md §2.5 N5; the north
rule's "suffix-array substring-dedup stage for exact long-match removal",
after Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — public-knowledge algorithms only; the reference has no substring
stage).

All-numpy implementation:

- :func:`suffix_array` — prefix-doubling (Manber–Myers) with ``np.lexsort``;
  O(n log n) with O(1) Python iterations per doubling level.
- :func:`adjacent_lcp` — LCP of SA-adjacent suffixes by chunked vectorized
  byte comparison with an active-pair mask (cost ~ sum(lcp)/chunk vectorized
  steps, early-capped).
- :func:`duplicate_spans` — maximal SA runs whose adjacent LCP >= min_len
  share a >= min_len prefix; every occurrence except the smallest text
  position is marked as a duplicate span of the run-wide common-prefix
  length.  Keep-first = smallest position, matching the engine's min-id
  determinism contract (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 array via prefix doubling + lexsort.

    Ranks are int32 (partitions are far below 2^31 bytes), halving the
    memory traffic of every doubling round — the dominant cost.
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    assert n < 2**31 - 1
    rank = s.astype(np.int32)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int32)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r = rank[order]
        k2 = key2[order]
        changed = np.empty(n, dtype=np.int32)
        changed[0] = 1
        changed[1:] = ((r[1:] != r[:-1]) | (k2[1:] != k2[:-1])).astype(np.int32)
        new_rank = np.empty(n, dtype=np.int32)
        new_rank[order] = np.cumsum(changed, dtype=np.int32) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n, dtype=np.int64)
    return sa


def adjacent_lcp(
    s: np.ndarray,
    sa: np.ndarray,
    max_lcp: int,
    chunk: int = 64,
    min_interest: int = 0,
) -> np.ndarray:
    """LCP of each SA-adjacent suffix pair, capped at ``max_lcp``.

    With ``min_interest > 0`` (screening mode), pairs whose LCP is below
    ``min_interest`` may report any value < min_interest: a cheap first-
    ``min(16, min_interest)``-byte comparison (two flat gathers, no per-pair
    index matrices) retires the overwhelming majority of pairs before the
    exact chunked loop runs on the survivors.  Pairs at or above
    ``min_interest`` always get their exact (capped) LCP.

    Vectorized over all still-active pairs per chunk offset; a pair retires
    as soon as a mismatch (or a text end / the cap) is hit.
    """
    n = len(s)
    m = n - 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    a = sa[:-1].copy()
    b = sa[1:].copy()
    lcp = np.zeros(m, dtype=np.int64)
    active = np.arange(m)
    off = 0
    if min_interest > 0 and n > 16:
        # cascading screens: each probe eliminates pairs whose LCP < probe
        # (such pairs can't reach min_interest); gathers shrink geometrically
        for probe in (16, 32, 64):
            if probe > min_interest or probe >= n:
                break
            w = np.lib.stride_tricks.sliding_window_view(s, probe)  # view
            aa = a[active]
            bb = b[active]
            full = (aa <= n - probe) & (bb <= n - probe)
            ia = np.minimum(aa, n - probe)
            ib = np.minimum(bb, n - probe)
            eq = (w[ia] == w[ib]).all(axis=1) & full
            active = active[eq]
            # non-survivors keep lcp 0 (< min_interest, value immaterial)
    while len(active) and off < max_lcp:
        step = min(chunk, max_lcp - off)
        aa = a[active] + off
        bb = b[active] + off
        # compare up to `step` bytes for each active pair
        limit = np.minimum(step, np.minimum(n - aa, n - bb))
        width = int(limit.max()) if len(limit) else 0
        if width <= 0:
            break
        ia = np.minimum(aa[:, None] + np.arange(width)[None, :], n - 1)
        ib = np.minimum(bb[:, None] + np.arange(width)[None, :], n - 1)
        eq = s[ia] == s[ib]
        eq &= np.arange(width)[None, :] < limit[:, None]
        # matched prefix length within this chunk
        run = eq.cumprod(axis=1).sum(axis=1)
        lcp[active] += run
        active = active[(run == limit) & (limit == step)]
        off += step
    return lcp


def duplicate_spans(
    s: np.ndarray, min_len: int, max_lcp: int = 1 << 14
) -> tuple[np.ndarray, np.ndarray]:
    """Positions of duplicated substrings of length >= min_len.

    Returns (starts, lengths): for every maximal SA run sharing a prefix of
    >= min_len, each occurrence except the smallest start position yields one
    span of the run-wide common-prefix length (capped at max_lcp).
    """
    sa = suffix_array(s)
    # screening mode: sub-min_len LCPs are never read (only the dup mask and
    # run minima of dup adjacencies matter)
    lcp = adjacent_lcp(s, sa, max_lcp, min_interest=min_len)
    dup = lcp >= min_len
    if not dup.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # maximal runs of consecutive dup adjacencies: run of SA indices
    # [i, j] where all adjacent lcps in between are >= min_len
    edges = np.flatnonzero(np.diff(np.r_[0, dup.view(np.int8), 0]))
    run_starts, run_ends = edges[::2], edges[1::2]  # dup[start:end] all True
    starts_out, lens_out = [], []
    for rs, re_ in zip(run_starts, run_ends):
        members = sa[rs : re_ + 1]  # re_+1 suffixes share the prefix
        run_lcp = int(lcp[rs:re_].min())
        keep = members.min()
        dup_members = members[members != keep]
        starts_out.append(dup_members)
        lens_out.append(np.full(len(dup_members), run_lcp, dtype=np.int64))
    return np.concatenate(starts_out), np.concatenate(lens_out)


def merge_spans(starts: np.ndarray, ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Union of [start, end) intervals (inputs need not be sorted)."""
    if len(starts) == 0:
        return starts, ends
    order = np.argsort(starts, kind="stable")
    s = starts[order]
    e = ends[order]
    # running max of ends; a new merged interval starts where s > max(e[:i])
    run_max = np.maximum.accumulate(e)
    new = np.r_[True, s[1:] > run_max[:-1]]
    grp = np.cumsum(new) - 1
    out_s = s[new]
    out_e = np.maximum.reduceat(e, np.flatnonzero(new))
    return out_s, out_e

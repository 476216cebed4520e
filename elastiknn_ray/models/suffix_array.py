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


def _pack8_key(s: np.ndarray) -> np.ndarray:
    """uint64 key per position: the suffix's first 8 bytes packed big-endian
    (zero-padded past the end).  One windowed materialization + one cast —
    ~5x less memory traffic than eight shifted-OR passes."""
    n = len(s)
    pad = np.zeros(n + 7, dtype=np.uint8)
    pad[:n] = s
    w = np.ascontiguousarray(np.lib.stride_tricks.sliding_window_view(pad, 8)[:n])
    return w.reshape(n, 8).view(">u8").astype(np.uint64).reshape(n)


def suffix_array(
    s: np.ndarray, max_depth: int | None = None, _key: np.ndarray | None = None
) -> np.ndarray:
    """Suffix array of a uint8 array via prefix doubling, with two classic
    accelerations over naive Manber–Myers (both public-knowledge; cf.
    Larsson & Sadakane 1999, "Faster suffix sorting"):

    - **8-byte seed**: the initial order sorts one big-endian-packed uint64
      of each suffix's first 8 bytes — one argsort replaces the first three
      doubling rounds.
    - **tie-only refinement**: each round lexsorts ONLY the positions whose
      rank is still shared (runs of length > 1); resolved suffixes never
      re-enter a sort.  For real text the unresolved set collapses
      geometrically, so total sort work is ~O(n log n) on the duplicated
      part only, instead of every round paying a full-array lexsort.

    With ``max_depth = D``, doubling stops once suffixes are ordered by
    their first >= D bytes; ties beyond that depth keep an arbitrary (but
    grouped) order.  Sound for duplicate detection capped at LCP <= D:
    any set of suffixes sharing a >= L prefix (L <= D) is still contiguous,
    and the minimum adjacent LCP over a block equals the block's common
    prefix length under ANY internal permutation (some adjacent pair must
    straddle the block's first split point).

    Ranks and slot keys are int64 (composite-key rounds pack rank pairs).
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    assert n < 2**31 - 1
    # seed: first 8 bytes of each suffix packed big-endian into a uint64.
    # Zero-padding past the end conflates "no byte" with a real 0x00 byte,
    # so ties additionally break on clamped remaining length: equal padded
    # keys with different lengths mean the shorter suffix is a strict
    # prefix of the longer → shorter sorts first.  (Without this, suffixes
    # ending in genuine 0x00 runs — e.g. the intra-kernel's little-endian
    # separator indices — stay tied forever: every doubling round hands
    # them all the same -1 sentinel, breaking the doubling induction.)
    key = _pack8_key(s) if _key is None else _key
    rem = np.minimum(np.arange(n, 0, -1, dtype=np.int64), 8)
    # key-only stable argsort; the rem tie-break (zero-padding vs real 0x00
    # conflation — see above) only differs from 8 for the LAST 7 suffixes,
    # so their equal-key runs get a tiny targeted re-order instead of a
    # second full lexsort pass.
    order = np.argsort(key, kind="stable")
    tail = np.flatnonzero(rem < 8)
    if len(tail):
        # each tail suffix's equal-key run via two indirect binary searches
        # (sorter=order) — O(7 log n), no materialized sorted-key array
        seen: set[int] = set()
        for t in tail:
            v = key[t : t + 1]
            s0 = int(np.searchsorted(key, v, side="left", sorter=order)[0])
            if s0 in seen:
                continue
            seen.add(s0)
            e0 = int(np.searchsorted(key, v, side="right", sorter=order)[0])
            if e0 - s0 > 1:
                seg = order[s0:e0]
                order[s0:e0] = seg[np.lexsort((seg, rem[seg]))]
    ks = key[order]
    rs = rem[order]
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    newg[1:] = (ks[1:] != ks[:-1]) | (rs[1:] != rs[:-1])
    # rank value = SA slot of the group's first member ("group start"
    # encoding, Larsson–Sadakane): refining one group never renumbers any
    # other group, so each round only touches unresolved positions.
    slots = np.arange(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.maximum.accumulate(np.where(newg, slots, 0))
    glen = np.diff(np.r_[np.flatnonzero(newg), n])
    act = np.flatnonzero(np.repeat(glen > 1, glen))  # SA slots still tied
    k = 8
    while len(act) and k < n and (max_depth is None or k < max_depth):
        pos = order[act]
        nxt = pos + k
        key2 = np.where(nxt < n, rank[np.minimum(nxt, n - 1)], -1)
        r_act = rank[pos]
        # injective composite (r_act, key2) -> one stable argsort pass
        # instead of lexsort's two (both int64 < n, product < 2^63 for any
        # partition-sized blob)
        sub = np.argsort(r_act * np.int64(n + 1) + (key2 + 1), kind="stable")
        pos = pos[sub]
        key2 = key2[sub]
        r_act = r_act[sub]
        order[act] = pos
        m = len(act)
        newg = np.empty(m, dtype=bool)
        newg[0] = True
        newg[1:] = (r_act[1:] != r_act[:-1]) | (key2[1:] != key2[:-1])
        rank[pos] = np.maximum.accumulate(np.where(newg, act, 0))
        glen = np.diff(np.r_[np.flatnonzero(newg), m])
        act = act[np.repeat(glen > 1, glen)]
        k *= 2
    return order.astype(np.int64)


def adjacent_lcp(
    s: np.ndarray,
    sa: np.ndarray,
    max_lcp: int,
    chunk: int = 64,
    min_interest: int = 0,
    _key: np.ndarray | None = None,
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
    min_interest = min(min_interest, max_lcp)  # screens never pass the cap
    if min_interest >= 8 and n > 8:
        # zeroth screen: first-8-bytes equality via ONE packed uint64 key
        # per position (the suffix_array seed key) — two 1-D gathers and a
        # uint64 compare, no (m, probe) byte matrices.  Retires the bulk of
        # the pairs before any 2-D gather screen runs.
        key = _pack8_key(s) if _key is None else _key
        ok = (
            (key[a[active]] == key[b[active]])
            & (a[active] <= n - 8)
            & (b[active] <= n - 8)
        )
        active = active[ok]
        off = 8
        del key
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
            # non-survivors keep lcp 0 (< min_interest, value immaterial);
            # survivors have their first `probe` bytes verified EQUAL — the
            # exact loop resumes there instead of re-comparing them
            off = probe
    lcp[active] = off  # screens verified the first `off` bytes equal
    while len(active) and off < max_lcp:
        step = min(chunk, max_lcp - off)
        aa = a[active] + off
        bb = b[active] + off
        # compare up to `step` bytes for each active pair
        limit = np.minimum(step, np.minimum(n - aa, n - bb))
        if not len(limit) or int(limit.max()) <= 0:
            break
        full = (aa <= n - step) & (bb <= n - step)
        run = np.zeros(len(aa), dtype=np.int64)
        if step < n and full.any():
            # flat (m_active, step) window gathers (uint8, ~step bytes/pair)
            # instead of two int64 index matrices (16x the memory traffic);
            # first mismatch position via argmax over the inequality mask
            w = np.lib.stride_tricks.sliding_window_view(s, step)
            neq = w[aa[full]] != w[bb[full]]
            anym = neq.any(axis=1)
            run[full] = np.where(anym, neq.argmax(axis=1), step)
        tail = ~full if step < n else np.ones(len(aa), dtype=bool)
        if tail.any():
            # pairs whose suffix ends inside this chunk (or a tiny blob):
            # per-position clamped indexing on the few remaining rows
            ta, tb, tl = aa[tail], bb[tail], limit[tail]
            width = int(tl.max()) if len(tl) else 0
            if width > 0:
                ia = np.minimum(ta[:, None] + np.arange(width)[None, :], n - 1)
                ib = np.minimum(tb[:, None] + np.arange(width)[None, :], n - 1)
                eq = s[ia] == s[ib]
                eq &= np.arange(width)[None, :] < tl[:, None]
                run[tail] = eq.cumprod(axis=1).sum(axis=1)
        lcp[active] += run
        active = active[run == step]
        off += step
    return lcp


def duplicate_spans(
    s: np.ndarray, min_len: int, max_lcp: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Positions of duplicated substrings of length >= min_len.

    Returns (starts, lengths): for every maximal SA run sharing a prefix of
    >= min_len, each occurrence except the smallest start position yields one
    span of the run-wide common-prefix length (capped at max_lcp).

    ``max_lcp`` defaults to ``min_len``: a duplicated region [a, b) of any
    length has a qualifying suffix at EVERY p in [a, b-min_len], each
    emitting a capped >= min_len span, so the downstream per-doc interval
    union still covers [a, b) exactly — while the suffix sort and LCP scan
    never pay for depth beyond min_len.
    """
    if max_lcp is None:
        max_lcp = min_len
    # depth-capped sort: order beyond max_lcp bytes is irrelevant (the
    # reported span length is capped there anyway; see suffix_array docs
    # for why grouped-but-arbitrary tie order preserves run detection)
    key = _pack8_key(s) if len(s) else None  # shared by sort + LCP screen
    sa = suffix_array(s, max_depth=max_lcp, _key=key)
    # screening mode: sub-min_len LCPs are never read (only the dup mask and
    # run minima of dup adjacencies matter)
    lcp = adjacent_lcp(s, sa, max_lcp, min_interest=min_len, _key=key)
    dup = lcp >= min_len
    if not dup.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # maximal runs of consecutive dup adjacencies: run of SA indices
    # [i, j] where all adjacent lcps in between are >= min_len.  Fully
    # vectorized over runs: per-run min-lcp and min-member via reduceat on
    # the compacted dup-only arrays.
    edges = np.flatnonzero(np.diff(np.r_[0, dup.view(np.int8), 0]))
    run_starts, run_ends = edges[::2], edges[1::2]  # dup[start:end] all True
    n_adj = run_ends - run_starts  # adjacencies per run; members = n_adj + 1
    # run-wide lcp: min over each run's adjacencies (compact dup-only lcps)
    lcp_d = lcp[dup]
    adj_off = np.zeros(len(run_starts), dtype=np.int64)
    np.cumsum(n_adj[:-1], out=adj_off[1:])
    run_lcp = np.minimum.reduceat(lcp_d, adj_off)
    # members of run r = sa[run_starts[r] : run_ends[r] + 1]
    memb = np.r_[dup, False].copy()
    memb[run_ends] = True  # include each run's trailing suffix
    members = sa[np.flatnonzero(memb)]
    m_off = np.zeros(len(run_starts), dtype=np.int64)
    np.cumsum(n_adj[:-1] + 1, out=m_off[1:])
    keep = np.minimum.reduceat(members, m_off)
    rid = np.repeat(np.arange(len(run_starts)), n_adj + 1)
    is_dup = members != keep[rid]
    return members[is_dup], run_lcp[rid[is_dup]]


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

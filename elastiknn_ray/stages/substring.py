"""Suffix-array substring-dedup stage (SURVEY.md §2.5 N5, §7 M7).

Composite two-path design, each path's partitioning assumption explicit:

- **intra-partition exact path**: docs are hash-partitioned on
  ``doc_id % P``; a per-partition kernel concatenates the partition's texts
  (0xFF + doc-index separators — 0xFF never occurs in UTF-8, and the index
  bytes break any accidental run across the separator), builds a suffix
  array, and emits every duplicated span >= min_len *within the partition*
  (models/suffix_array.py).  Finds all matches between co-partitioned docs
  at exact span extents.

- **cross-partition window path**: winnowing fingerprints (text/winnow.py)
  of every doc are shuffled on fingerprint; any exact common run of
  >= w + g - 1 bytes between ANY two docs shares a selected fingerprint
  regardless of partitioning.  Colliding windows are confirmed by a second
  INDEPENDENT 64-bit rolling hash (joint false-match ~2^-128 — below the
  engine's accepted content-hash collision budget, stages/dedup.py; raw
  bytes would multiply the shuffle row ~4x) and every occurrence
  except the first (min doc_id, then min pos) becomes a w-byte span;
  overlapping/adjacent window spans merge downstream.  Resolution is window-
  granular rather than maximal-extent — the intra-partition path provides
  exact extents for co-located matches; the window path guarantees no
  cross-partition duplicate >= w + g - 1 bytes escapes.

Keep-first rule everywhere: smallest (doc_id, pos) occurrence survives —
the engine's min-id determinism contract (SURVEY.md §4).

Partitioning assumption (reproducibility contract): DETECTION of any
duplicated run >= window + guard - 1 bytes is partition-agnostic (the
window path's winnowing guarantee), but span EXTENTS are not — a doc pair
that is co-partitioned gets exact suffix-array extents while a split pair
gets window-granular extents (up to 2*(guard-1) bytes shorter per run,
unless ``extend_cross``).  The partition count is therefore a property of
the PLAN — resolved once from data size via ``target_blob_bytes`` — and
must never be derived from cluster size: the same corpus at the same
config must use the same partition count at every parallelism level, or
downstream coverage-threshold consumers (pipelines/decide.py) can flip
boundary docs between runs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from elastiknn_ray.models.suffix_array import duplicate_spans, merge_spans
from elastiknn_ray.text.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_pair,
)


@dataclass(frozen=True)
class SubstringConfig:
    min_len: int = 200  # bytes; Lee et al. 2022 use 50 BPE tokens ~ 200 bytes
    window: int = 64  # w: fingerprint window bytes
    guard: int = 32  # g: winnowing guard window (guarantee = w + g - 1)
    #: None = byte-budgeted auto: P = max(min_partitions,
    #: ceil(total_text_bytes / target_blob_bytes)), so a partition's suffix-
    #: array blob is capped at ~target_blob_bytes no matter the corpus size
    #: (a fixed P would mean corpus_bytes/P per blob — ~3 TB per SA at
    #: 100 TB; the scale-killer VERDICT r2 flagged).
    num_partitions: int | None = None
    target_blob_bytes: int = 256 << 20
    min_partitions: int = 32
    #: winnow-screen the intra path: drop docs with no repeated fingerprint
    #: in their partition before suffix-array construction.  Lossless for
    #: the stage's output whenever window + guard - 1 <= min_len (every
    #: duplicated run >= min_len forces a repeated selected fingerprint in
    #: both copies — Schleimer 2003 guarantee), so partitions that are
    #: mostly unique pay one vectorized rolling-hash pass instead of an
    #: O(n log n) suffix sort over the whole blob.  Auto-disabled when the
    #: guarantee precondition fails.
    screen: bool = True
    #: maximal-extent cross path: colliding windows keep their matched
    #: first occurrence, a text join fetches the (dup-only) pair texts, and
    #: local byte extension reports the exact maximal common run — the
    #: combined threshold then applies ``min_len`` exactly instead of the
    #: ``min_merged_len`` guard slack (window-granular boilerplate below
    #: min_len no longer survives).  Off by default: the window-granular
    #: path avoids the two text joins and is the pinned-fixture default.
    extend_cross: bool = False


def resolve_num_partitions(docs, cfg: SubstringConfig) -> int:
    """Byte-budgeted partition count: one cheap column-pruned pass summing
    text byte lengths (at 100 TB this is a Parquet-metadata-cheap scan of
    ONE column, not the corpus), then P = ceil(total / target_blob_bytes)
    floored at ``min_partitions`` so small corpora keep full parallelism."""
    if cfg.num_partitions is not None:
        return cfg.num_partitions
    import pyarrow.compute as pc

    def nbytes(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.fill_null(t.column("text"), ""), pa.large_binary())
        tot = pc.sum(pc.binary_length(b)).as_py() or 0
        return pa.table({"n": pa.array([int(tot)], pa.int64())})

    total = (
        docs.select_columns(["text"])
        .map_batches(nbytes, batch_format="pyarrow")
        .sum("n")
        or 0
    )
    return max(cfg.min_partitions, -(-int(total) // cfg.target_blob_bytes))


# ---------------------------------------------------------------- intra path

_EMPTY_SPANS = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "start": pa.array([], pa.int64()),
        "end": pa.array([], pa.int64()),
    }
)


def _screen_suspects(
    ids: np.ndarray, texts: list[bytes], w: int, g: int
) -> tuple[np.ndarray, list[bytes]] | None:
    """Winnow screen (SubstringConfig.screen): returns the (ids, texts)
    subset that can participate in a duplicated run >= w + g - 1 bytes —
    docs owning at least one fingerprint value that repeats anywhere in
    the partition (across docs OR within one doc).  None = no repeats, the
    caller skips suffix-array construction entirely.  Hash collisions only
    over-retain (false suspects), never lose a span."""
    row_ix, _, fp = winnow_fingerprints(texts, w, g)
    if len(fp) == 0:
        return None
    uniq, inv, counts = np.unique(fp, return_inverse=True, return_counts=True)
    hot = counts[inv] > 1
    if not hot.any():
        return None
    keep = np.unique(row_ix[hot])  # sorted => preserves the doc_id order
    return ids[keep], [texts[k] for k in keep]


def _intra_partition_kernel(
    t: pa.Table, min_len: int, window: int = 0, guard: int = 0
) -> pa.Table:
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = [x.encode("utf-8") if x is not None else b"" for x in t.column("text").to_pylist()]
    # deterministic concat order (partition row order varies with execution)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    texts = [texts[i] for i in order]
    # screen only under the lossless precondition (see SubstringConfig)
    if window and guard and window + guard - 1 <= min_len:
        kept = _screen_suspects(ids, texts, window, guard)
        if kept is None:
            return _EMPTY_SPANS
        ids, texts = kept
    sep_parts, bounds = [], [0]
    for i, b in enumerate(texts):
        sep_parts.append(b)
        sep_parts.append(bytes([0xFF]) + int(i).to_bytes(8, "little"))
        bounds.append(bounds[-1] + len(b) + 9)
    blob = np.frombuffer(b"".join(sep_parts), dtype=np.uint8)
    starts, lens = duplicate_spans(blob, min_len)
    if len(starts) == 0:
        return _EMPTY_SPANS
    doc_starts = np.array(bounds[:-1], dtype=np.int64)
    doc_text_ends = doc_starts + np.array([len(b) for b in texts], dtype=np.int64)
    ix = np.searchsorted(doc_starts, starts, side="right") - 1
    local_start = starts - doc_starts[ix]
    local_end = np.minimum(starts + lens, doc_text_ends[ix]) - doc_starts[ix]
    keep = (local_end - local_start) >= min_len  # clip can shrink below min
    # a span starting inside a separator region is clipped away entirely
    keep &= local_start < (doc_text_ends[ix] - doc_starts[ix])
    return pa.table(
        {
            "doc_id": pa.array(ids[ix[keep]], pa.int64()),
            "start": pa.array(local_start[keep], pa.int64()),
            "end": pa.array(local_end[keep], pa.int64()),
        }
    )


def intra_partition_spans(
    docs,
    min_len: int,
    num_partitions: int = 32,
    *,
    window: int = 0,
    guard: int = 0,
):
    """docs(doc_id, text) → (doc_id, start, end) duplicate spans found by a
    per-partition suffix array.  Partitioning assumption: detects matches
    only between docs in the same ``doc_id % num_partitions`` cell (the
    window path covers the rest).  Non-zero ``window``/``guard`` enable the
    lossless winnow screen before suffix-array construction."""
    keyed = docs.map_batches(
        lambda t, p=num_partitions: t.append_column(
            "part",
            pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False) % p, pa.int64()
            ),
        ),
        batch_format="pyarrow",
    )
    return keyed.groupby("part").map_groups(
        lambda t, m=min_len, w=window, g=guard: _intra_partition_kernel(
            t.drop_columns(["part"]), m, w, g
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- cross path

def _fingerprint_batch(t: pa.Table, w: int, g: int) -> pa.Table:
    """Fingerprint rows for the cross-path shuffle: (fp, doc_id, pos, fp2).

    Window equality is confirmed by TWO independent 64-bit rolling hashes
    instead of shipping the raw w-byte window with every fingerprint (the
    r4 shape): equal windows always agree on both; distinct windows agree
    on both w.p. ~2^-128 — far below the engine's accepted 64-bit
    content-hash collision budget (stages/dedup.py) — and the shuffle row
    shrinks from 88+w bytes to 32."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = [x.encode("utf-8") if x is not None else b"" for x in t.column("text").to_pylist()]
    row_ix, pos, fp, fp2 = winnow_fingerprints_pair(texts, w, g)
    return pa.table(
        {
            "fp": pa.array(fp, pa.uint64()),
            "doc_id": pa.array(ids[row_ix], pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "fp2": pa.array(fp2, pa.uint64()),
        }
    )


def _window_dups_kernel(t: pa.Table, w: int) -> pa.Table:
    """Within one fingerprint partition: group by (fp, fp2) — double-hash
    window identity (see :func:`_fingerprint_batch`); every occurrence
    except the (min doc_id, min pos) first emits a w-byte span.

    One lexsort over (pos, ids, fp2, fp) gives the grouped order; group
    boundaries are fp-or-fp2 changes.  No Python tuples, no factorize."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    if n == 0:
        return _EMPTY_SPANS
    fp = t.column("fp").to_numpy(zero_copy_only=False)
    fp2 = t.column("fp2").to_numpy(zero_copy_only=False)
    pos = t.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, ids, fp2, fp))
    fs = fp[order]
    f2s = fp2[order]
    first = np.r_[True, (fs[1:] != fs[:-1]) | (f2s[1:] != f2s[:-1])]
    # every later occurrence of the same window content is a duplicate span,
    # including within one doc.
    dup = ~first
    return pa.table(
        {
            "doc_id": pa.array(ids[order][dup], pa.int64()),
            "start": pa.array(pos[order][dup], pa.int64()),
            "end": pa.array(pos[order][dup] + w, pa.int64()),
        }
    )


def cross_partition_window_spans(docs, cfg: SubstringConfig, num_partitions: int | None = None):
    """docs → (doc_id, start, end) w-byte duplicate-window spans, alignment-
    robust across any partitioning (winnowing guarantee >= w + g - 1)."""
    p = num_partitions if num_partitions is not None else resolve_num_partitions(docs, cfg)
    fps = docs.map_batches(
        lambda t, w=cfg.window, g=cfg.guard: _fingerprint_batch(t, w, g),
        batch_format="pyarrow",
    )
    keyed = fps.map_batches(
        lambda t, p=p: t.append_column(
            "part",
            pa.array(
                t.column("fp").to_numpy(zero_copy_only=False) % np.uint64(p),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )
    return keyed.groupby("part").map_groups(
        lambda t, w=cfg.window: _window_dups_kernel(t.drop_columns(["part"]), w),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- combined

def _merge_per_doc(t: pa.Table) -> pa.Table:
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    s = t.column("start").to_numpy(zero_copy_only=False)
    e = t.column("end").to_numpy(zero_copy_only=False)
    order = np.lexsort((s, ids))
    ids, s, e = ids[order], s[order], e[order]
    out_i, out_s, out_e = [], [], []
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    ends = np.r_[starts[1:], len(ids)]
    for a, b in zip(starts, ends):
        ms, me = merge_spans(s[a:b], e[a:b])
        out_i.append(np.full(len(ms), ids[a], dtype=np.int64))
        out_s.append(ms)
        out_e.append(me)
    if not out_i:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "start": pa.array([], pa.int64()),
                "end": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_i), pa.int64()),
            "start": pa.array(np.concatenate(out_s), pa.int64()),
            "end": pa.array(np.concatenate(out_e), pa.int64()),
        }
    )


def min_merged_len(cfg: SubstringConfig) -> int:
    """Post-merge length threshold that enforces ``min_len`` on the window
    path without dropping true matches: winnowing selects a window start in
    every ``guard``-length range, so a duplicated run of length R yields a
    merged window-span extent >= R - 2*(guard-1).  Filtering merged spans
    below ``min_len - 2*(guard-1)`` therefore keeps every true >= min_len
    run while rejecting isolated short boilerplate windows (which merge to
    ~``window`` bytes) — the min_len contract both paths now share."""
    return max(cfg.window, cfg.min_len - 2 * (cfg.guard - 1))


def substring_spans(docs, cfg: SubstringConfig | None = None):
    """Union of both paths, merged per doc, filtered to the shared
    ``min_len`` contract → (doc_id, start, end).  Partition count is
    resolved ONCE (byte-budgeted when cfg.num_partitions is None) and
    shared by both paths and the merge shuffle."""
    cfg = cfg or SubstringConfig()
    p = resolve_num_partitions(docs, cfg)
    intra = intra_partition_spans(
        docs,
        cfg.min_len,
        p,
        window=cfg.window if cfg.screen else 0,
        guard=cfg.guard if cfg.screen else 0,
    )
    cross = (
        cross_partition_extended_spans(docs, cfg, p)
        if cfg.extend_cross
        else cross_partition_window_spans(docs, cfg, p)
    )
    both = intra.union(cross)
    keyed = both.map_batches(
        lambda t, p=p: t.append_column(
            "part",
            pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False) % p, pa.int64()
            ),
        ),
        batch_format="pyarrow",
    )
    merged = keyed.groupby("part").map_groups(
        lambda t: _merge_per_doc(t.drop_columns(["part"])), batch_format="pyarrow"
    )
    # extended cross extents are exact, so min_len applies directly; the
    # window-granular default needs the min_merged_len guard slack
    thresh = cfg.min_len if cfg.extend_cross else min_merged_len(cfg)
    return merged.map_batches(
        lambda t, th=thresh: t.filter(
            pa.compute.greater_equal(
                pa.compute.subtract(t.column("end"), t.column("start")),
                pa.scalar(th, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )


def _pack_spans_partition(t: pa.Table) -> pa.Table:
    """One coarse-key partition of (doc_id, start, end) → (doc_id, spans)
    with all of a doc's spans packed as interleaved (start, end) uint64
    pairs in one large_binary cell — the same vectorized
    lexsort-and-reduce shape every other grouped kernel uses."""
    from elastiknn_ray.stages.hashing import encode_u64_lists

    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    s = t.column("start").to_numpy(zero_copy_only=False).astype(np.int64)
    e = t.column("end").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((s, ids))
    ids, s, e = ids[order], s[order], e[order]
    run_starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    counts = np.diff(np.r_[run_starts, len(ids)])
    inter = np.empty(2 * len(s), dtype=np.uint64)
    inter[0::2] = s.view(np.uint64)
    inter[1::2] = e.view(np.uint64)
    offsets = np.zeros(len(run_starts) + 1, dtype=np.int64)
    np.cumsum(2 * counts, out=offsets[1:])
    return pa.table(
        {
            "doc_id": pa.array(ids[run_starts], pa.int64()),
            "spans": encode_u64_lists(offsets, inter),
        }
    )


def remove_spans(docs, spans, *, num_partitions: int = 8):
    """docs(doc_id, text) ⋈ spans → (doc_id, text) with duplicate byte ranges
    cut out (docs without spans pass through unchanged).

    Spans are grouped per doc by one coarse-keyed shuffle + vectorized pack
    kernel (no per-row AggregateFn), left-joined onto docs, and the cut runs
    on the batch's flat byte buffer with a single delete mask: only docs
    that actually have spans are re-decoded."""
    import pyarrow.compute as pc
    import ray.data as rd

    from elastiknn_ray.stages.blocks import drop_empty_blocks
    from elastiknn_ray.stages.hashing import decode_u64_lists

    keyed = spans.map_batches(
        lambda t, p=num_partitions: t.append_column(
            "part",
            pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False) % p, pa.int64()
            ),
        ),
        batch_format="pyarrow",
    )
    spans_per_doc = keyed.groupby("part").map_groups(
        lambda t: _pack_spans_partition(t.drop_columns(["part"])),
        batch_format="pyarrow",
    ).materialize()
    if spans_per_doc.count() == 0:
        return docs.select_columns(["doc_id", "text"])
    joined = docs.join(
        drop_empty_blocks(spans_per_doc),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("doc_id",),
    )

    def cut(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        spans_col = t.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        has = ~np.asarray(spans_col.is_null())
        if not has.any():
            return pa.table({"doc_id": t.column("doc_id"), "text": txt})
        # flat byte view of the whole batch's texts (zero-copy cast)
        b = txt.cast(pa.large_binary())
        n = len(b)
        boff = np.frombuffer(b.buffers()[1], dtype=np.int64)[
            b.offset : b.offset + n + 1
        ]
        flat = np.frombuffer(b.buffers()[2], dtype=np.uint8)[boff[0] : boff[-1]]
        boff = boff - boff[0]
        # decode spans for rows that have them; clamp to each doc's length
        so, sv = decode_u64_lists(spans_col.fill_null(b""))
        starts_g, ends_g = [], []
        rows = np.flatnonzero(has)
        for r in rows:
            pairs = sv[so[r] : so[r + 1]].view(np.int64)
            doc_len = boff[r + 1] - boff[r]
            s = np.minimum(pairs[0::2], doc_len) + boff[r]
            e = np.minimum(pairs[1::2], doc_len) + boff[r]
            starts_g.append(s)
            ends_g.append(e)
        delta = np.zeros(len(flat) + 1, dtype=np.int64)
        np.add.at(delta, np.concatenate(starts_g), 1)
        np.add.at(delta, np.concatenate(ends_g), -1)
        deleted = np.cumsum(delta[:-1]) > 0
        keep = ~deleted
        kept_flat = flat[keep]
        # kept byte count per row -> new offsets into kept_flat
        if len(flat):
            # reduceat needs indices < len; trailing empty rows would point
            # at len(flat) — clamp, then zero all empty rows explicitly
            idx = np.minimum(boff[:-1], len(flat) - 1)
            kept_per_row = np.add.reduceat(keep.astype(np.int64), idx)
            kept_per_row = np.where(boff[1:] > boff[:-1], kept_per_row, 0)
        else:
            kept_per_row = np.zeros(n, np.int64)
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_per_row, out=new_off[1:])
        repl = pa.array(
            [
                kept_flat[new_off[r] : new_off[r + 1]]
                .tobytes()
                .decode("utf-8", errors="ignore")
                for r in rows
            ],
            pa.string(),
        )
        result = pc.replace_with_mask(txt, pa.array(has), repl)
        return pa.table({"doc_id": t.column("doc_id"), "text": result})

    return joined.map_batches(cut, batch_format="pyarrow")


# ------------------------------------- maximal-extent cross-partition path

def _window_pairs_kernel(t: pa.Table) -> pa.Table:
    """Like :func:`_window_dups_kernel` but keeps WHO matched: each later
    occurrence pairs with its group's first (min doc_id, min pos) →
    (doc_a, pos_a, doc_b, pos_b) with (doc_a, pos_a) the kept-first side.
    Fully vectorized (group index by cumsum over the first-mask)."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    if n == 0:
        return _EMPTY_PAIR_WINDOWS
    fp = t.column("fp").to_numpy(zero_copy_only=False)
    fp2 = t.column("fp2").to_numpy(zero_copy_only=False)
    pos = t.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, ids, fp2, fp))
    fs, f2s = fp[order], fp2[order]
    first = np.r_[True, (fs[1:] != fs[:-1]) | (f2s[1:] != f2s[:-1])]
    grp = np.cumsum(first) - 1
    fi = np.flatnonzero(first)
    ids_o, pos_o = ids[order], pos[order]
    dup = ~first
    return pa.table(
        {
            "doc_a": pa.array(ids_o[fi][grp[dup]], pa.int64()),
            "pos_a": pa.array(pos_o[fi][grp[dup]], pa.int64()),
            "doc_b": pa.array(ids_o[dup], pa.int64()),
            "pos_b": pa.array(pos_o[dup], pa.int64()),
        }
    )


_EMPTY_PAIR_WINDOWS = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "pos_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "pos_b": pa.array([], pa.int64()),
    }
)


def _pack_pairs_kernel(t: pa.Table) -> pa.Table:
    """One coarse pair-hash partition of (doc_a, pos_a, doc_b, pos_b) →
    (doc_a, doc_b, windows) with all of an ordered doc pair's colliding
    windows packed as interleaved (pos_a, pos_b) uint64 pairs, sorted by
    (diagonal, pos_b) so the extension kernel streams them in run order.
    Packing BEFORE the text join means each doc pair ships its texts once,
    not once per colliding window (a long shared run selects ~run/guard
    windows)."""
    from elastiknn_ray.stages.hashing import encode_u64_lists

    da = t.column("doc_a").to_numpy(zero_copy_only=False)
    if len(da) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "windows": pa.array([], pa.large_binary()),
            }
        )
    db = t.column("doc_b").to_numpy(zero_copy_only=False)
    pa_ = t.column("pos_a").to_numpy(zero_copy_only=False)
    pb_ = t.column("pos_b").to_numpy(zero_copy_only=False)
    diag = pb_ - pa_
    order = np.lexsort((pb_, diag, db, da))
    da, db, pa_, pb_ = da[order], db[order], pa_[order], pb_[order]
    first = np.r_[True, (da[1:] != da[:-1]) | (db[1:] != db[:-1])]
    starts = np.flatnonzero(first)
    counts = np.diff(np.r_[starts, len(da)])
    vals = np.empty(2 * len(da), dtype=np.uint64)
    vals[0::2] = pa_.astype(np.uint64)
    vals[1::2] = pb_.astype(np.uint64)
    offsets = np.r_[0, np.cumsum(2 * counts)].astype(np.int64)
    return pa.table(
        {
            "doc_a": pa.array(da[starts], pa.int64()),
            "doc_b": pa.array(db[starts], pa.int64()),
            "windows": encode_u64_lists(offsets, vals),
        }
    )


def _common_prefix_len(x: np.ndarray, y: np.ndarray) -> int:
    m = min(len(x), len(y))
    if m == 0:
        return 0
    neq = x[:m] != y[:m]
    ix = int(neq.argmax())
    return m if not neq[ix] else ix


def _extend_packed_batch(t: pa.Table, w: int) -> pa.Table:
    """(doc_a, doc_b, windows, text_a, text_b) → maximal-extent spans for
    the doc_b (kept-later) side: each seed window byte-verifies, then
    extends left/right while the two texts agree.  Seeds already covered by
    the previous extension on the same diagonal are skipped, so a run of R
    bytes pays one O(R) extension, not one per selected window."""
    from elastiknn_ray.stages.hashing import decode_u64_lists

    n = t.num_rows
    if n == 0:
        return _EMPTY_SPANS
    offsets, vals = decode_u64_lists(t.column("windows"))
    db_col = t.column("doc_b").to_numpy(zero_copy_only=False)
    ta_col = t.column("text_a").to_pylist()
    tb_col = t.column("text_b").to_pylist()
    out_i, out_s, out_e = [], [], []
    for r in range(n):
        seg = vals[offsets[r] : offsets[r + 1]]
        pa_arr = seg[0::2].astype(np.int64)
        pb_arr = seg[1::2].astype(np.int64)
        ra, rb = ta_col[r] or b"", tb_col[r] or b""
        a = np.frombuffer(ra.encode("utf-8") if isinstance(ra, str) else ra, np.uint8)
        b = np.frombuffer(rb.encode("utf-8") if isinstance(rb, str) else rb, np.uint8)
        diag = pb_arr - pa_arr
        cov_diag, cov_end = None, -1
        for j in range(len(pa_arr)):
            pj, qj, dj = int(pa_arr[j]), int(pb_arr[j]), int(diag[j])
            if dj == cov_diag and qj + w <= cov_end:
                continue
            # byte-verify the seed (the double rolling hash is identity
            # w.p. 1-2^-128; this makes the extended span unconditionally
            # true at the cost of w bytes per seed)
            if not np.array_equal(a[pj : pj + w], b[qj : qj + w]):
                continue
            left = _common_prefix_len(a[pj - 1 :: -1] if pj else a[:0], b[qj - 1 :: -1] if qj else b[:0])
            right = _common_prefix_len(a[pj + w :], b[qj + w :])
            out_i.append(db_col[r])
            out_s.append(qj - left)
            out_e.append(qj + w + right)
            cov_diag, cov_end = dj, qj + w + right
    return pa.table(
        {
            "doc_id": pa.array(np.array(out_i, dtype=np.int64), pa.int64()),
            "start": pa.array(np.array(out_s, dtype=np.int64), pa.int64()),
            "end": pa.array(np.array(out_e, dtype=np.int64), pa.int64()),
        }
    )


#: broadcast gate for the extension stage's text fetch: candidate-doc text
#: volume up to this many bytes ships as ONE object-store copy (shuffle-free
#: extension); above it, two hash joins move only the colliding docs' texts.
EXTEND_BROADCAST_TEXT_BYTES = 2 << 30


class _BroadcastExtend:
    """Actor-pool extension: the colliding docs' texts gathered once into
    the object store (shard refs), looked up by sorted-id searchsorted per
    packed-pair batch — the same shape as verify's broadcast path."""

    def __init__(self, shard_refs, w: int):
        import ray

        ids_parts, text_parts = [], []
        for t in ray.get(list(shard_refs)):
            ids_parts.append(t.column("doc_id").to_numpy(zero_copy_only=False))
            text_parts.extend(
                (x or "").encode("utf-8") for x in t.column("text").to_pylist()
            )
        ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.texts = [text_parts[i] for i in order]
        self.w = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_SPANS
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ixa = np.searchsorted(self.ids, da)
        ixb = np.searchsorted(self.ids, db)
        if (self.ids[np.minimum(ixa, len(self.ids) - 1)] != da).any() or (
            self.ids[np.minimum(ixb, len(self.ids) - 1)] != db
        ).any():
            raise KeyError("pair doc_ids missing from gathered texts")
        with_texts = batch.append_column(
            "text_a", pa.array([self.texts[i] for i in ixa], pa.large_binary())
        ).append_column(
            "text_b", pa.array([self.texts[i] for i in ixb], pa.large_binary())
        )
        return _extend_packed_batch(with_texts, self.w)


def cross_partition_extended_spans(docs, cfg: SubstringConfig, num_partitions: int | None = None):
    """docs → (doc_id, start, end) MAXIMAL-extent duplicate spans,
    alignment-robust across any partitioning.

    Same winnowing collision front as :func:`cross_partition_window_spans`,
    then: colliding windows keep their matched first occurrence → packed
    per ordered doc pair → the pair texts fetched (broadcast-gated: one
    object-store copy of just the COLLIDING docs' texts below
    EXTEND_BROADCAST_TEXT_BYTES, two hash joins above) → local byte
    extension to the maximal common run.  Extents are exact, so the caller
    can threshold at ``min_len`` directly (no ``min_merged_len`` guard
    slack — window-granular boilerplate below min_len no longer survives,
    and true runs report their full extent).

    Partitioning assumptions: the pair-pack shuffle keys on a coarse hash
    of the ordered doc pair (uniform); the text fetch moves only docs that
    actually collide (banded ~O(dup docs), not corpus-sized).  The join
    fallback requires a populated left side (Ray's hash-join builds empty
    partitions schema-less); it only engages above the broadcast gate,
    where every partition holds rows."""
    p = num_partitions if num_partitions is not None else resolve_num_partitions(docs, cfg)
    import ray.data as rd

    fps = docs.map_batches(
        lambda t, w=cfg.window, g=cfg.guard: _fingerprint_batch(t, w, g),
        batch_format="pyarrow",
    )
    keyed = fps.map_batches(
        lambda t, p=p: t.append_column(
            "part",
            pa.array(
                t.column("fp").to_numpy(zero_copy_only=False) % np.uint64(p),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = keyed.groupby("part").map_groups(
        lambda t: _window_pairs_kernel(t.drop_columns(["part"])),
        batch_format="pyarrow",
    ).materialize()  # colliding-window pair rows: ~O(dup windows), small
    if pairs.count() == 0:
        return rd.from_arrow(_EMPTY_SPANS)

    def _pair_part(t: pa.Table, p: int) -> pa.Table:
        da = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        db = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        mix = (da * np.uint64(0x9E3779B97F4A7C15)) ^ db
        return t.append_column("part", pa.array(mix % np.uint64(p), pa.uint64()))

    packed = (
        pairs.map_batches(lambda t, p=p: _pair_part(t, p), batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: _pack_pairs_kernel(t.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    texts = docs.select_columns(["doc_id", "text"])

    # ---- broadcast path: gather just the colliding docs' texts ----------
    import ray

    id_parts = [
        np.concatenate(
            [
                b.column("doc_a").to_numpy(zero_copy_only=False),
                b.column("doc_b").to_numpy(zero_copy_only=False),
            ]
        )
        for b in pairs.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_format="pyarrow"
        )
    ]
    cand_ids = np.unique(np.concatenate(id_parts))
    ids_ref = ray.put(cand_ids)

    def filt(t: pa.Table, _ids_ref=ids_ref) -> pa.Table:
        ids = ray.get(_ids_ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        return t.filter(pa.array(ids[pos] == d))

    hits = texts.map_batches(filt, batch_format="pyarrow").materialize()
    if hits.size_bytes() <= EXTEND_BROADCAST_TEXT_BYTES:
        return packed.map_batches(
            _BroadcastExtend,
            fn_constructor_kwargs={
                "shard_refs": hits.to_arrow_refs(),
                "w": cfg.window,
            },
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=(1, 32),
        )

    # ---- join fallback: above the gate, partitions are populated --------
    jp = max(8, min(64, p))
    ja = packed.join(
        texts, join_type="inner", num_partitions=jp,
        on=("doc_a",), right_on=("doc_id",),
    ).rename_columns({"text": "text_a"}).select_columns(
        ["doc_a", "doc_b", "windows", "text_a"]
    )
    jb = ja.join(
        texts, join_type="inner", num_partitions=jp,
        on=("doc_b",), right_on=("doc_id",),
    ).rename_columns({"text": "text_b"}).select_columns(
        ["doc_a", "doc_b", "windows", "text_a", "text_b"]
    )
    return jb.map_batches(
        lambda t, w=cfg.window: _extend_packed_batch(t, w), batch_format="pyarrow"
    )

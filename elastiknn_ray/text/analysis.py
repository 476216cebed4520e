"""Text-analysis kernels for training-data pipelines: language ID (stopword
n-gram heuristic), quality counts/score (Gopher-style surface heuristics,
Rae et al. 2021 — public knowledge), and document fingerprinting (minimum
rolling-window hash).  All batch-vectorized; no external models or data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from elastiknn_ray.text.winnow import _CHUNK as _MIN_CHUNK
from elastiknn_ray.text.winnow import rolling_hashes

#: Small function-word profiles (public knowledge).  Deliberately tiny: the
#: op's contract is a deterministic heuristic, not a trained model.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it was for on are as with his they at be "
        "this have from or had by not but what all were when we there can an "
        "your which their said if do will each about how up out them she many".split()
    ),
    "de": frozenset(
        "der die das und ist in den von zu mit sich des auf für nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei einer "
        "um am sind noch wie einem über einen so zum war haben nur oder".split()
    ),
    "fr": frozenset(
        "le de la et les des en un une du que est pour qui dans a par plus "
        "pas au sur ne se ce il sont avec son ils aux cette ses mais comme "
        "ou si leur y dont elle tout deux meme ont cela".split()
    ),
    "es": frozenset(
        "el la de que y a en un ser se no haber por con su para como estar "
        "tener le lo todo pero mas hacer o poder decir este ir otro ese si "
        "me ya ver porque dar cuando muy sin vez mucho".split()
    ),
}

#: Minimum stopword-hit fraction to claim a language; below → "und".
LANG_MIN_RATIO = 0.08


def language_id(texts: list[str]) -> tuple[list[str], np.ndarray]:
    """Per text: (language code or 'und', stopword-hit ratio of the winner).

    Vectorized: the batch's tokens are factorized once; each unique token is
    tested against each profile once; per-doc hit counts come from one
    bincount per language.
    """
    n = len(texts)
    counts = np.empty(n, dtype=np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        counts[i] = len(toks)
        flat.extend(toks)
    if not flat:
        return ["und"] * n, np.zeros(n)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    doc_of_tok = np.repeat(np.arange(n), counts)
    ratios = np.zeros((len(STOPWORDS), n))
    for li, (_, words) in enumerate(STOPWORDS.items()):
        is_stop = np.fromiter((u in words for u in uniques), dtype=bool, count=len(uniques))
        hits = np.bincount(doc_of_tok, weights=is_stop[codes], minlength=n)
        ratios[li] = np.divide(hits, counts, out=np.zeros(n), where=counts > 0)
    best = ratios.argmax(axis=0)
    best_ratio = ratios[best, np.arange(n)]
    langs = list(STOPWORDS.keys())
    out = [
        langs[b] if r >= LANG_MIN_RATIO else "und"
        for b, r in zip(best, best_ratio)
    ]
    return out, best_ratio


_PUNCT = frozenset(".,;:!?'\"()[]{}-–—…/\\")

#: RE2 char class matching exactly the ``_PUNCT`` set (and the DuckDB
#: oracle's class in pipelines/queries.py).
_PUNCT_RE = r"[\].,;:!?'\"(){}\[\-–—…/\\]"


def quality_counts(texts) -> dict[str, np.ndarray]:
    """Integer surface statistics per text (SQL-expressible; the DuckDB
    oracle mirrors each count): n_chars, n_tokens, n_unique_tokens,
    n_alpha_chars, n_digit_chars, n_punct_chars, max_token_len.

    Accepts a list[str] or an Arrow string column.  All counts run as
    Arrow RE2 C kernels (count_substring_regex / utf8_length); the two
    per-token stats (distinct count, max length) flatten the token lists
    once and reduce with factorize + bincount — no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    else:
        arr = pa.array(["" if t is None else t for t in texts], pa.string())
    arr = pc.fill_null(arr, "")
    n = len(arr)

    def _count(pattern: str) -> np.ndarray:
        return (
            pc.count_substring_regex(arr, pattern)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    out = {
        "n_chars": pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False),
        "n_tokens": _count(r"\S+"),
        "n_alpha_chars": _count(r"\p{L}"),
        "n_digit_chars": _count(r"\p{Nd}"),
        "n_punct_chars": _count(_PUNCT_RE),
    }

    toks = pc.utf8_split_whitespace(arr)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # slice the flat values to this array's logical window before aligning
    flat = toks.values.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    lens = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    nonempty = lens > 0  # the splitter emits '' tokens at string edges
    d_ne, l_ne = doc_of_tok[nonempty], lens[nonempty]

    max_len = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_len, d_ne, l_ne)
    out["max_token_len"] = max_len

    uniq = np.zeros(n, dtype=np.int64)
    if len(d_ne):
        import pandas as pd

        codes, uniques = pd.factorize(
            flat.to_numpy(zero_copy_only=False)[nonempty], sort=False
        )
        key = d_ne * (len(uniques) + 1) + codes
        ukey = np.unique(key)
        uniq = np.bincount(
            (ukey // (len(uniques) + 1)).astype(np.int64), minlength=n
        ).astype(np.int64)
    out["n_unique_tokens"] = uniq
    return out


def quality_score(counts: dict[str, np.ndarray]) -> np.ndarray:
    """Composite [0, 1] quality heuristic from the surface counts —
    Gopher-style document filters expressed as soft penalties:
    too-short/too-long docs, low alpha fraction, low token diversity,
    degenerate mean token length."""
    nt = counts["n_tokens"].astype(np.float64)
    nc = np.maximum(counts["n_chars"].astype(np.float64), 1)
    alpha_frac = counts["n_alpha_chars"] / nc
    # out= is required with where=: without it masked lanes are
    # UNINITIALIZED memory (a nan/inf there would poison the 0-token case)
    uniq_frac = np.divide(
        counts["n_unique_tokens"],
        np.maximum(nt, 1),
        out=np.zeros_like(nt),
        where=nt > 0,
    )
    mean_tok = np.divide(nc, np.maximum(nt, 1))
    s_len = np.clip(nt / 50.0, 0, 1) * np.clip((100_000 - nt) / 50_000.0, 0, 1)
    s_alpha = np.clip((alpha_frac - 0.5) / 0.3, 0, 1)
    s_uniq = np.clip((uniq_frac - 0.1) / 0.4, 0, 1)
    s_tok = np.clip((mean_tok - 2.0) / 2.0, 0, 1) * np.clip((12.0 - mean_tok) / 4.0, 0, 1)
    return np.clip(s_len * (0.4 * s_alpha + 0.3 * s_uniq + 0.3 * s_tok), 0, 1)


def doc_fingerprints(texts: list[str], w: int = 32) -> np.ndarray:
    """64-bit content fingerprint per text: the minimum rolling-hash over all
    w-byte windows (robust to where a doc starts inside a larger stream);
    shorter texts hash whole-content.  uint64 (N,)."""
    return doc_fingerprints_arrow(
        pa.array(("" if t is None else t for t in texts), pa.string()), w
    )


def doc_fingerprints_arrow(col, w: int = 32) -> np.ndarray:
    """`doc_fingerprints` straight off an Arrow string column's utf-8 data
    buffer — ONE rolling-hash pass over the whole batch instead of a Python
    loop with per-doc array allocations.  The Rabin-Karp window hash is
    position-independent (hash(i) = sum_j s[i+j]*B^(w-1-j) mod 2^64), so
    hashes computed over the shared buffer are bit-identical to per-doc
    hashes; windows that would cross a doc boundary are simply never
    gathered.  Nulls fingerprint as 0 (same as the empty string)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    n = len(col)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt, count=n + 1, offset=col.offset * np.dtype(off_dt).itemsize).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    if not col.null_count:
        lens = offs[1:] - offs[:-1]
    else:
        valid = np.asarray(col.is_valid())
        lens = np.where(valid, offs[1:] - offs[:-1], 0)

    big = np.flatnonzero(lens >= w)
    if big.size:
        lo, hi = int(offs[big[0]]), int(offs[big[-1] + 1])
        nwin = hi - lo - w + 1
        # Interleaved segment boundaries over global window positions:
        # [valid_start_0, valid_end_0, valid_start_1, ...] — even segments
        # are each doc's window range, odd segments the boundary-crossing
        # windows between docs (always non-empty: >= w-1 positions).  The
        # hashes are consumed CHUNK-AT-A-TIME with per-chunk reduceat mins
        # folded into out — no O(total-bytes) allocation ever materializes
        # (fresh large arrays cost more in page faults than the hashing
        # itself on this class of host).
        bounds = np.empty(2 * big.size - 1, dtype=np.int64)
        bounds[0::2] = offs[big] - lo
        bounds[1::2] = (offs[big + 1] - lo - w + 1)[:-1]
        mins = np.full(big.size, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
        step = _MIN_CHUNK - w + 1
        for start in range(0, nwin, step):
            stop = min(start + step, nwin)
            h = rolling_hashes(data[lo + start : lo + stop + w - 1], w)
            i = int(np.searchsorted(bounds, start, "right")) - 1
            j = int(np.searchsorted(bounds, stop, "left"))
            lb = bounds[i:j] - start
            lb[0] = 0  # segment i may begin before this chunk
            seg_min = np.minimum.reduceat(h, lb)
            seg_ids = np.arange(i, j)
            docs = seg_ids[seg_ids % 2 == 0] >> 1
            np.minimum.at(mins, docs, seg_min[seg_ids % 2 == 0])
        out[big] = mins

    # Short docs hash whole-content: group by exact length so each group
    # shares one fixed-window pass (every doc contributes exactly one window).
    short = np.flatnonzero((lens > 0) & (lens < w))
    if short.size:
        for length in np.unique(lens[short]):
            sel = short[lens[short] == length]
            gidx = (offs[sel][:, None] + np.arange(length)[None, :]).ravel()
            h = rolling_hashes(data[gidx], int(length))
            out[sel] = h[:: int(length)][: sel.size]
    return out

"""k-shingling of text into hashed 64-bit shingle IDs (SURVEY.md §2.5 N2).

The output per document is a **sorted, deduplicated** uint64 array — the
engine's ``Vec.SparseBool`` (Vec.scala:10-31) with the reference's
sorted-indices invariant (VectorMapper.scala:31).  Shingle IDs feed the
MinHash kernel, which reduces them mod HASH_PRIME, so the 64-bit space here
only needs to be deterministic and well-mixed.

Vectorization strategy (no per-row Python in the hot path beyond ``str.split``):
tokens of the whole batch are flattened, factorized (pandas, C speed), each
*unique* token hashed once with blake2b-8, then shingle hashes are computed
globally as a position-weighted polynomial over sliding windows of the flat
token-hash array, masking windows that cross document boundaries.

Documents with 0 < n_tokens < k get a single shingle covering all their
tokens (so short documents stay distinguishable); documents with 0 tokens get
an empty set → the MinHash empty-vector sentinel path
(JaccardLshModel.java:37-38).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from elastiknn_ray.config import ShingleConfig

_U64 = np.uint64
#: odd 64-bit Rabin-Karp-style base for position-weighted combination
_BASE = _U64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 finalizer (Steele et al.) for diffusion."""
    x = x + _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _hash_token(tok: str) -> int:
    return int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")


def tokenize_batch(texts: list[str], lowercase: bool = True) -> tuple[np.ndarray, list[str]]:
    """Whitespace tokenization of a batch: returns (token_counts int64 (N,),
    flat token list).  ``str.split()`` splits on any whitespace run and drops
    empties — the engine's single canonical tokenizer (mirrored in the DuckDB
    oracle SQL via regexp splitting)."""
    counts = np.empty(len(texts), dtype=np.int64)
    flat: list[str] = []
    for i, t in enumerate(texts):
        toks = (t.lower() if lowercase else t).split()
        counts[i] = len(toks)
        flat.extend(toks)
    return counts, flat


def _token_hashes(flat_tokens: list[str]) -> np.ndarray:
    """uint64 hash per token; each unique token hashed once (factorize)."""
    if not flat_tokens:
        return np.empty(0, dtype=np.uint64)
    codes, uniques = pd.factorize(np.asarray(flat_tokens, dtype=object), sort=False)
    uh = np.fromiter(
        (_hash_token(u) for u in uniques), dtype=np.uint64, count=len(uniques)
    )
    return uh[codes]


def shingle_batch(
    texts: list[str], cfg: ShingleConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle a batch of texts → (offsets int64 (N+1,), values uint64 (M,)),
    values sorted-unique within each document."""
    if cfg.mode == "word":
        counts, flat = tokenize_batch(texts, cfg.lowercase)
        th = _token_hashes(flat)
    elif cfg.mode == "char":
        enc = [(t.lower() if cfg.lowercase else t).encode("utf-8") for t in texts]
        counts = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
        th = (
            np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
            if counts.sum()
            else np.empty(0, dtype=np.uint64)
        )
        th = _splitmix64(th)  # diffuse single bytes before combining
    else:
        raise ValueError(f"unknown shingle mode: {cfg.mode}")

    n = len(texts)
    k = cfg.k
    tok_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offsets[1:])
    total = int(tok_offsets[-1])

    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)

    # Full-length windows, computed globally then masked at doc boundaries.
    sh_doc_parts: list[np.ndarray] = []
    sh_val_parts: list[np.ndarray] = []
    if total >= k:
        nwin = total - k + 1
        h = np.zeros(nwin, dtype=np.uint64)
        base_int = int(_BASE)
        for j in range(k - 1, -1, -1):
            mult = _U64(pow(base_int, k - 1 - j, 1 << 64))
            h += th[j : j + nwin] * mult
        valid = doc_of_tok[:nwin] == doc_of_tok[k - 1 : k - 1 + nwin]
        sh_doc_parts.append(doc_of_tok[:nwin][valid])
        sh_val_parts.append(_splitmix64(h[valid]))

    # Short (0 < n_tokens < k) documents: one shingle over all tokens.
    short = np.flatnonzero((counts > 0) & (counts < k))
    if len(short):
        vals = np.empty(len(short), dtype=np.uint64)
        base_int = int(_BASE)
        for i, d in enumerate(short):
            seg = th[tok_offsets[d] : tok_offsets[d + 1]]
            acc = 0
            for v in seg:
                acc = (acc * base_int + int(v)) & 0xFFFFFFFFFFFFFFFF
            vals[i] = _splitmix64(np.array([acc], dtype=np.uint64))[0]
        sh_doc_parts.append(short.astype(np.int64))
        sh_val_parts.append(vals)

    if sh_doc_parts:
        sdoc = np.concatenate(sh_doc_parts)
        sval = np.concatenate(sh_val_parts)
    else:
        sdoc = np.empty(0, dtype=np.int64)
        sval = np.empty(0, dtype=np.uint64)

    # Per-doc sort + unique in one global pass: order by (doc, value), then
    # drop adjacent duplicates within a doc.
    order = np.lexsort((sval, sdoc))
    sdoc = sdoc[order]
    sval = sval[order]
    if len(sval):
        keep = np.ones(len(sval), dtype=bool)
        keep[1:] = (sval[1:] != sval[:-1]) | (sdoc[1:] != sdoc[:-1])
        sdoc = sdoc[keep]
        sval = sval[keep]

    out_counts = np.bincount(sdoc, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_counts, out=offsets[1:])
    return offsets, sval


def shingle_one(text: str, cfg: ShingleConfig) -> np.ndarray:
    """Single-document convenience wrapper (tests / oracles)."""
    offsets, values = shingle_batch([text], cfg)
    return values[offsets[0] : offsets[1]]

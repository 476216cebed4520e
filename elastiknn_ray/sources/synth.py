"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is a **pure function of (seed, row_id)** — generation composes with
any partitioning: the Ray path is ``ray.data.range(n).map_batches(PageGen)``
and produces byte-identical rows regardless of block layout, matching the
reference's seeded-golden-corpus strategy (TestData.scala:85-92).

Duplicate-injection roles (deterministic per row id; ground truth recoverable
via :func:`truth_pairs`):

- ``base``   (~78%) fresh text from a seeded token model (vocab 10k,
  lognormal length 50-5000 tokens)
- ``clone``  (~5%)  verbatim copy of an earlier base row under a new url
- ``near``   (~10%) mutated copy (1-15% token substitution/deletion)
- ``substr`` (~3%)  fresh text with a >=200-char substring injected from an
  earlier base row (suffix-array stage target; usually below the Jaccard
  threshold)
- ``hot``    (~2%)  fresh text plus one shared boilerplate paragraph
  (hot-band / skew stressor)
- ``empty``  (~0.5%) empty text (MinHash empty-vector sentinel path,
  JaccardLshModel.java:37-38)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

VOCAB_SIZE = 10_000
EPOCH_2025_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

_ROLES = ("base", "clone", "near", "substr", "hot", "empty")


def _mix(x: int) -> int:
    """splitmix64 on a Python int (deterministic role/derivation hashing)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def role_of(i: int, seed: int) -> str:
    if i < 8:  # ensure early rows are bases so dup targets exist
        return "base"
    r = _mix(i ^ (seed * 0x9E3779B9)) % 1000
    if r < 780:
        return "base"
    if r < 830:
        return "clone"
    if r < 930:
        return "near"
    if r < 960:
        return "substr"
    if r < 995:
        return "hot"
    return "empty"


def base_target(i: int, seed: int) -> int:
    """Earlier row id with role 'base' that row i duplicates (pure function)."""
    h = _mix(i * 31 ^ seed)
    j = h % i
    while role_of(j, seed) != "base":
        h = _mix(h)
        j = h % i
    return j


_WORDS = None


def _vocab() -> list[str]:
    global _WORDS
    if _WORDS is None:
        _WORDS = [f"w{ix:05d}" for ix in range(VOCAB_SIZE)]
    return _WORDS


def _base_tokens(i: int, seed: int) -> list[str]:
    rng = np.random.default_rng((seed, i, 0))
    n = int(np.clip(np.exp(rng.normal(5.6, 0.9)), 50, 5000))
    # power-law token frequencies (realistic shingle hotness)
    idx = (rng.random(n) ** 2.2 * VOCAB_SIZE).astype(np.int64)
    words = _vocab()
    return [words[j] for j in idx]


_BOILERPLATE = None


def _boilerplate(seed: int) -> list[str]:
    global _BOILERPLATE
    if _BOILERPLATE is None or _BOILERPLATE[0] != seed:
        rng = np.random.default_rng((seed, 0xB01))
        idx = (rng.random(30) ** 2.2 * VOCAB_SIZE).astype(np.int64)
        words = _vocab()
        _BOILERPLATE = (seed, [words[j] for j in idx])
    return _BOILERPLATE[1]


def text_of(i: int, seed: int) -> str:
    """The text column for row i — pure, O(doc length)."""
    role = role_of(i, seed)
    if role == "empty":
        return ""
    if role == "base":
        return " ".join(_base_tokens(i, seed))
    if role == "clone":
        return text_of(base_target(i, seed), seed)
    if role == "near":
        j = base_target(i, seed)
        toks = text_of(j, seed).split()
        rng = np.random.default_rng((seed, i, 1))
        rate = 0.01 + 0.14 * rng.random()
        u = rng.random(len(toks))
        words = _vocab()
        out = []
        for t, p in zip(toks, u):
            if p >= rate:
                out.append(t)
            elif p < rate * 0.4:
                continue  # deletion
            else:
                out.append(words[int(rng.random() * VOCAB_SIZE)])
        return " ".join(out) if out else toks[0]
    if role == "substr":
        j = base_target(i, seed)
        donor = text_of(j, seed).split()
        own = _base_tokens(i, seed)
        rng = np.random.default_rng((seed, i, 2))
        # >=200 chars ~= 34 tokens of 'wNNNNN '
        span = min(len(donor), 34 + int(rng.random() * 30))
        start = int(rng.random() * max(1, len(donor) - span))
        pos = int(rng.random() * (len(own) + 1))
        return " ".join(own[:pos] + donor[start : start + span] + own[pos:])
    if role == "hot":
        own = _base_tokens(i, seed)
        return " ".join(own + _boilerplate(seed))
    raise AssertionError(role)


def url_of(i: int, seed: int, n_hosts: int) -> str:
    role = role_of(i, seed)
    if role == "hot":
        host = 0  # hot-band stressor concentrates on one host
    else:
        host = int((_mix(i ^ seed ^ 0xD00D) % 2**32) / 2**32 * n_hosts)
    return f"https://site{host}.example/page{i}"


def html_of(text: str, url: str, host_id: str) -> bytes:
    """Template HTML wrapping the text; extract_text(html) == text byte-for-byte
    (boilerplate lives outside <main>, content is entity-escaped inside)."""
    import html as _h

    esc = _h.escape(text)
    return (
        f"<html><head><title>{host_id}</title>"
        f"<style>body {{ margin: 0; }}</style>"
        f'<script>var t = "tracker";</script></head>'
        f'<body><nav><a href="/">home</a> <a href="/about">about {host_id}</a></nav>'
        f"<main>{esc}</main>"
        f"<footer>&copy; 2025 {host_id} &middot; all rights reserved</footer>"
        f"</body></html>"
    ).encode("utf-8")


def lang_of(i: int, seed: int) -> str:
    r = _mix(i ^ seed ^ 0x1A9) % 100
    if r < 90:
        return "en"
    if r < 94:
        return "de"
    if r < 98:
        return "fr"
    return ""


def make_rows(ids: np.ndarray, seed: int, n_total: int) -> pa.Table:
    """Generate the page rows for the given row ids (batch kernel)."""
    n_hosts = max(4, n_total // 50)
    urls, htmls, texts, langs, ts = [], [], [], [], []
    for i in map(int, ids):
        text = text_of(i, seed)
        url = url_of(i, seed, n_hosts)
        host_id = url.split("/")[2].split(".")[0]
        urls.append(url)
        texts.append(text)
        htmls.append(html_of(text, url, host_id))
        langs.append(lang_of(i, seed))
        ts.append(EPOCH_2025_US + i * 1_000_003)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


class PageGen:
    """Actor-pool batch generator for ``ray.data.range(n).map_batches(PageGen, ...)``."""

    def __init__(self, seed: int, n_total: int):
        self.seed = seed
        self.n_total = n_total

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        return make_rows(ids, self.seed, self.n_total)


def pages_dataset(n: int, seed: int = 42, *, override_num_blocks: int | None = None):
    """Ray Dataset of n synthetic pages (lazy, partition-invariant)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)

    # plain-function task pool (NOT an actor pool): generation is stateless
    # and CPU-heavy, so parallelism must scale with the cluster, not with a
    # fixed actor count
    def gen(batch: pa.Table, _seed=seed, _n=n) -> pa.Table:
        return make_rows(batch.column("id").to_numpy(), _seed, _n)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=2048)


def pages_table(n: int, seed: int = 42) -> pa.Table:
    """Driver-side (small-scale) generation for tests/fixtures."""
    return make_rows(np.arange(n), seed, n)


def truth_pairs(n: int, seed: int) -> pa.Table:
    """Ground-truth injected duplicate relations (doc ids = row ids)."""
    a, b, kind = [], [], []
    for i in range(n):
        role = role_of(i, seed)
        if role in ("clone", "near", "substr"):
            j = base_target(i, seed)
            a.append(j)
            b.append(i)
            kind.append(role)
    return pa.table(
        {
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "kind": pa.array(kind, pa.string()),
        }
    )

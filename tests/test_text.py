"""Text stack: shingling invariants (I2), extraction round-trip (N1), synth
corpus determinism (FIXTURES.md §1)."""

import numpy as np

from elastiknn_ray.config import ShingleConfig
from elastiknn_ray.sources import synth
from elastiknn_ray.text.extract import extract_text
from elastiknn_ray.text.shingle import shingle_batch, shingle_one


def test_shingles_sorted_unique():
    """The sorted-indices invariant (VectorMapper.scala:31)."""
    texts = ["a b c a b c a b c d", "x " * 100, "one two three"]
    offsets, values = shingle_batch(texts, ShingleConfig(k=3))
    for i in range(len(texts)):
        seg = values[offsets[i] : offsets[i + 1]]
        assert (np.diff(seg.astype(np.int64).view(np.uint64)) > 0).all() or len(seg) < 2
        assert len(np.unique(seg)) == len(seg)


def test_shingle_repeat_text_dedupes():
    a = shingle_one("a b c " * 50, ShingleConfig(k=3))
    assert len(a) <= 3  # only 3 distinct 3-gram windows exist


def test_shingle_batch_equals_single():
    texts = ["the quick brown fox", "jumps over", "", "lazy dog sleeps now here"]
    cfg = ShingleConfig(k=2)
    offsets, values = shingle_batch(texts, cfg)
    for i, t in enumerate(texts):
        assert np.array_equal(shingle_one(t, cfg), values[offsets[i] : offsets[i + 1]])


def test_short_doc_gets_one_shingle():
    cfg = ShingleConfig(k=5)
    s = shingle_one("only three tokens", cfg)
    assert len(s) == 1
    assert len(shingle_one("", cfg)) == 0
    # distinguishable from other short docs
    assert s[0] != shingle_one("other three tokens", cfg)[0]


def test_identical_texts_identical_shingles():
    cfg = ShingleConfig(k=5)
    t = "w1 w2 w3 w4 w5 w6 w7 w8"
    assert np.array_equal(shingle_one(t, cfg), shingle_one(t, cfg))


def test_char_mode():
    cfg = ShingleConfig(k=4, mode="char")
    s = shingle_one("abcdef", cfg)
    assert len(s) == 3  # abcd bcde cdef


def test_extract_roundtrip_byte_identical():
    """The north-rule per-row invariant: extract(html) == text byte-for-byte."""
    t = synth.pages_table(300, 42)
    for h, x in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        assert extract_text(h) == x


def test_extract_drops_boilerplate_and_scripts():
    html = (
        b"<html><head><style>p { color: red }</style>"
        b"<script>alert('x')</script></head>"
        b"<body><nav>MENU ITEMS</nav><main>Hello &amp; <b>world</b></main>"
        b"<footer>COPYRIGHT</footer></body></html>"
    )
    assert extract_text(html) == "Hello & world"
    assert extract_text(b"") == ""
    assert extract_text(b"no tags at all") == "no tags at all"
    assert extract_text(b"<body>a  b\n\nc</body>") == "a b c"


def test_synth_determinism_and_roles():
    t1 = synth.pages_table(100, 42)
    t2 = synth.pages_table(100, 42)
    assert t1.equals(t2)
    t3 = synth.pages_table(100, 43)
    assert not t1.column("text").equals(t3.column("text"))


def test_synth_partition_invariance():
    """Row i is a pure function of (seed, i) — generation must not depend on
    batch boundaries."""
    full = synth.make_rows(np.arange(50), 42, 50)
    parts = [synth.make_rows(np.arange(i, min(i + 7, 50)), 42, 50) for i in range(0, 50, 7)]
    import pyarrow as pa

    assert pa.concat_tables(parts).equals(full)


def test_truth_pairs_reference_real_duplicates():
    tp = synth.truth_pairs(300, 42)
    t = synth.pages_table(300, 42)
    texts = t.column("text").to_pylist()
    for a, b, kind in zip(
        tp.column("doc_a").to_pylist(),
        tp.column("doc_b").to_pylist(),
        tp.column("kind").to_pylist(),
    ):
        assert a < b
        if kind == "clone":
            assert texts[a] == texts[b]
        elif kind == "near":
            # mutated copy: token overlap stays high (mutation rate <= 15%);
            # a low-rate short doc may even come out identical
            sa, sb = set(texts[a].split()), set(texts[b].split())
            assert len(sa & sb) / max(1, len(sa | sb)) > 0.5

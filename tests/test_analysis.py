"""Text-analysis op tests: language ID on real-language samples, quality
counts/score sanity, fingerprint invariances."""

import numpy as np

from elastiknn_ray.text.analysis import (
    doc_fingerprints,
    language_id,
    quality_counts,
    quality_score,
)

_SAMPLES = {
    "en": "the quick brown fox jumps over the lazy dog and all of the other "
    "animals that were in the yard at the time of this event",
    "de": "der schnelle braune fuchs springt über den faulen hund und die "
    "anderen tiere die zu dieser zeit auf dem hof waren sind auch da",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et les "
    "autres animaux qui sont dans la cour pour le moment",
    "es": "el zorro marrón rápido salta sobre el perro perezoso y todos los "
    "otros animales que estaban en el patio en ese momento",
}


def test_language_id_on_samples():
    texts = list(_SAMPLES.values())
    langs, conf = language_id(texts)
    assert langs == list(_SAMPLES.keys())
    assert (conf >= 0.08).all()


def test_language_id_und_on_noise():
    langs, _ = language_id(["w00001 w00002 w00003 w00004", ""])
    assert langs == ["und", "und"]


def test_quality_counts_basics():
    c = quality_counts(["Hello, world! 42", ""])
    assert c["n_chars"].tolist() == [16, 0]
    assert c["n_tokens"].tolist() == [3, 0]
    assert c["n_unique_tokens"].tolist() == [3, 0]
    assert c["n_digit_chars"].tolist() == [2, 0]
    assert c["n_punct_chars"].tolist() == [2, 0]
    assert c["n_alpha_chars"].tolist() == [10, 0]
    assert c["max_token_len"].tolist() == [6, 0]


def test_quality_score_orders_sensibly():
    good = " ".join(f"word{i} common text segment{i % 17}" for i in range(60))
    bad_short = "hi"
    bad_repeat = " ".join(["spam"] * 500)
    c = quality_counts([good, bad_short, bad_repeat])
    s = quality_score(c)
    assert s[0] > s[1]
    assert s[0] > s[2]


def test_fingerprint_deterministic_and_shift_robust():
    base = "some long document content that is repeated elsewhere " * 10
    fp = doc_fingerprints([base, "prefix junk " + base, base + " suffix junk"])
    # min-of-windows is robust to added prefix/suffix as long as the minimum
    # window survives inside the common content
    assert fp[0] == fp[1] == fp[2]
    fp2 = doc_fingerprints([base])
    assert fp2[0] == fp[0]
    # different content -> different fingerprint
    other = doc_fingerprints(["entirely different words live here " * 10])
    assert other[0] != fp[0]


def test_fingerprint_arrow_matches_per_row_loop():
    """doc_fingerprints_arrow (one pass over the Arrow buffer) is bit-exact
    vs the definitional per-doc rolling-hash loop, including nulls, empties,
    short docs (< window), multi-byte utf-8 and sliced/chunked arrays."""
    import pyarrow as pa

    from elastiknn_ray.text.analysis import doc_fingerprints_arrow
    from elastiknn_ray.text.winnow import rolling_hashes

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "δelta", "ε", "longword" * 5, "x"]
    texts: list = []
    for i in range(200):
        k = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, size=k)) if k else "")
    texts[3] = None
    texts[10] = "short"
    texts[11] = "1234567890123456789012345678901"  # 31 bytes: just under w
    texts[12] = "12345678901234567890123456789012"  # exactly w

    def per_row(ts, w=32):
        out = np.zeros(len(ts), dtype=np.uint64)
        for i, t in enumerate(ts):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(b):
                h = rolling_hashes(b, min(w, len(b)))
                out[i] = h.min() if len(h) else 0
        return out

    expect = per_row(texts)
    arr = pa.array(texts, pa.string())
    np.testing.assert_array_equal(doc_fingerprints_arrow(arr), expect)
    # sliced array (non-zero offset) and large_string
    np.testing.assert_array_equal(
        doc_fingerprints_arrow(arr.slice(5, 120)), expect[5:125]
    )
    np.testing.assert_array_equal(
        doc_fingerprints_arrow(arr.cast(pa.large_string())), expect
    )
    # chunked
    ch = pa.chunked_array([arr.slice(0, 50), arr.slice(50)])
    np.testing.assert_array_equal(doc_fingerprints_arrow(ch), expect)
    # list[str] wrapper delegates
    np.testing.assert_array_equal(doc_fingerprints(texts), expect)

"""Property-based tests (hypothesis) for the correctness-critical kernels:
the LSH band guarantees the dedup parity rests on, codec round-trips, URL
canonicalization idempotence, bloom no-false-negatives."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ieps_crawler_ray.functions.codecs import decode_image, encode_image
from ieps_crawler_ray.functions.hashing import MinHasher, hamming64, phash_band_keys
from ieps_crawler_ray.functions.urls import canonicalize_url
from ieps_crawler_ray.semantics import MINHASH_BANDS, PHASH_BANDS, minhasher


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_minhash_band_pigeonhole_no_false_negatives(data):
    """If est-Jaccard(sig_a, sig_b) ≥ 0.8 then the pair MUST share at least
    one of the 50 bands — the exactness claim behind engine==oracle dedup."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    mh = minhasher()
    sig_a = rng.integers(0, 2**32, 200, dtype=np.uint64)
    sig_b = sig_a.copy()
    n_diff = data.draw(st.integers(0, 40))  # ≤ 40 diffs ⇒ est-J ≥ 0.8
    pos = rng.choice(200, size=n_diff, replace=False)
    sig_b[pos] = sig_b[pos] ^ np.uint64(1) | np.uint64(1 << 33)
    assert np.mean(sig_a == sig_b) >= 0.8
    ka = mh.band_keys(sig_a[None, :], bands=MINHASH_BANDS)[0]
    kb = mh.band_keys(sig_b[None, :], bands=MINHASH_BANDS)[0]
    assert (ka == kb).any(), "band scheme missed a pair above the threshold"


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**63 - 1), st.sets(st.integers(0, 63), max_size=7))
def test_phash_band_pigeonhole(base, flip_bits):
    """Hamming ≤ 7 ⇒ at least one of the 8 pHash bands is equal."""
    a = np.array([base], dtype=np.uint64)
    b = a.copy()
    for bit in flip_bits:
        b ^= np.uint64(1) << np.uint64(bit)
    assert int(hamming64(a, b)[0]) <= 7
    ka = phash_band_keys(a.astype(np.int64), bands=PHASH_BANDS)[0]
    kb = phash_band_keys(b.astype(np.int64), bands=PHASH_BANDS)[0]
    assert (ka == kb).any()


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 6), st.integers(1, 6), st.integers(0, 2**32 - 1))
def test_png_roundtrip_lossless(hb, wb, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (hb * 8, wb * 8, 3), dtype=np.uint8)
    assert (decode_image(encode_image(px, "png"), "png") == px).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_lossy_codec_psnr_bound(seed):
    from ieps_crawler_ray.functions.codecs import psnr

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_image(encode_image(px, "jpeg"), "jpeg")
    assert psnr(px, out) >= 40.0  # the input_hint lossy invariant


@settings(max_examples=50, deadline=None)
@given(
    st.from_regex(r"http://[a-z0-9.]{1,20}(/[a-zA-Z0-9._~-]{1,10}){0,4}/?(\?[a-z=&]{0,10})?(#[a-z]{0,8})?", fullmatch=True)
)
def test_canonicalize_idempotent_and_fragment_free(url):
    """Idempotent for single-trailing-slash URLs (the reference strips
    exactly ONE trailing slash — crawler.py:353-356 — so `///` paths are
    not fixed points there either; our engine mirrors that contract)."""
    c = canonicalize_url(url)
    assert canonicalize_url(c) == c
    assert "#" not in c
    assert c.split("://", 1)[0].islower()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=500, unique=True))
def test_bloom_never_false_negative(keys):
    from ieps_crawler_ray.state.seen_filter import BloomFilter

    bf = BloomFilter(capacity=1000)
    arr = np.array(keys, dtype=np.uint64)
    bf.add_many(arr)
    assert bf.contains_many(arr).all()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60), min_size=1, max_size=20))
def test_minhash_identical_texts_have_jaccard_one(texts):
    mh = MinHasher(num_perms=50)
    sigs = mh.signatures([t.split() for t in texts])
    for i, t in enumerate(texts):
        dup = mh.signatures([t.split()])[0]
        assert MinHasher.jaccard(sigs[i], dup) == 1.0


# ---- round-2 parser robustness ---------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_clean_html_never_raises_on_arbitrary_text(txt):
    """The HTML cleaner must degrade gracefully on garbage input — fetched
    pages are untrusted bytes; a parser exception would kill a batch."""
    from ieps_crawler_ray.functions.html_clean import clean_html

    out, used = clean_html(txt)
    assert out is None or isinstance(out, str)
    assert isinstance(used, bool)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_sitemap_parser_never_raises(txt):
    from ieps_crawler_ray.functions.sitemap import parse_sitemap

    kind, locs = parse_sitemap(txt)
    assert kind in ("urlset", "index", "invalid")
    assert isinstance(locs, list)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_extract_image_urls_never_raises(txt):
    from ieps_crawler_ray.functions.html_clean import extract_image_urls

    out = extract_image_urls(txt)
    assert isinstance(out, list)
    assert len(out) == len(dict.fromkeys(out)), "must be deduped"


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=80), st.text(max_size=120))
def test_classify_page_total_function(ct, url):
    """Binary classification accepts any (content_type, url) pair."""
    from ieps_crawler_ray.functions.binary import classify_page

    ptype, dtype = classify_page(ct, url)
    assert ptype in ("BINARY", "HTML", "UNKNOWN")
    assert (ptype == "BINARY") == bool(dtype)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=40))
def test_hamming_cross_matches_elementwise(vals):
    """hamming64_cross must agree with the scalar hamming64 on every pair."""
    from ieps_crawler_ray.functions.hashing import hamming64, hamming64_cross

    p = np.array(vals, dtype=np.uint64)
    m = hamming64_cross(p, p)
    for i in range(len(p)):
        for j in range(len(p)):
            assert m[i, j] == hamming64(p[i : i + 1], p[j : j + 1])[0]

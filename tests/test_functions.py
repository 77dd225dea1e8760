"""Ray-free unit tests for the pure kernel library."""

import numpy as np
import pytest

from ieps_crawler_ray.functions import codecs, hashing, text, urls


class TestHashing:
    def test_hash64_deterministic(self):
        a = hashing.hash64(["http://a.example/x", "http://b.example/y"])
        b = hashing.hash64(["http://a.example/x", "http://b.example/y"])
        assert a.dtype == np.uint64
        assert (a == b).all()
        assert a[0] != a[1]

    def test_splitmix64_counter(self):
        x = hashing.splitmix64(np.arange(10, dtype=np.uint64))
        assert len(np.unique(x)) == 10

    def test_minhash_jaccard_estimate(self):
        mh = hashing.MinHasher(num_perms=200)
        a = "the quick brown fox jumps over the lazy dog".split()
        b = "the quick brown fox jumps over the lazy cat".split()
        c = "completely different words entirely here now".split()
        sigs = mh.signatures([a, b, c])
        sim_ab = hashing.MinHasher.jaccard(sigs[0], sigs[1])
        sim_ac = hashing.MinHasher.jaccard(sigs[0], sigs[2])
        # true Jaccard(a,b) = 7/9 ≈ 0.78
        assert 0.6 < sim_ab < 0.95
        assert sim_ac < 0.2

    def test_minhash_identical_sets(self):
        mh = hashing.MinHasher(num_perms=100)
        sigs = mh.signatures([["x", "y"], ["y", "x"]])
        assert (sigs[0] == sigs[1]).all()

    def test_minhash_empty_doc(self):
        mh = hashing.MinHasher(num_perms=16)
        sigs = mh.signatures([[], ["a"], []])
        assert (sigs[0] == mh.empty).all()
        assert (sigs[2] == mh.empty).all()
        assert not (sigs[1] == mh.empty).all()

    def test_band_keys_collide_for_identical(self):
        mh = hashing.MinHasher(num_perms=200)
        sigs = mh.signatures([["a", "b", "c"], ["a", "b", "c"], ["q", "r", "s"]])
        keys = mh.band_keys(sigs, bands=25)
        assert keys.shape == (3, 25)
        assert (keys[0] == keys[1]).all()
        assert not (keys[0] == keys[2]).any()

    def test_simhash_similarity(self):
        a = "the quick brown fox jumps over the lazy dog".split()
        b = "the quick brown fox jumps over the lazy cat".split()
        c = "totally unrelated content stream of junk tokens".split()
        h = hashing.simhash64([a, b, c])
        d_ab = hashing.hamming64(h[:1], h[1:2])[0]
        d_ac = hashing.hamming64(h[:1], h[2:3])[0]
        assert d_ab < d_ac

    def test_phash_similar_images(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        noisy = np.clip(img.astype(np.int16) + rng.integers(-2, 3, img.shape), 0, 255).astype(
            np.uint8
        )
        other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        h1, h2, h3 = (hashing.phash64(x) for x in (img, noisy, other))
        d12 = hashing.hamming64(
            np.array([h1], dtype=np.int64).astype(np.uint64),
            np.array([h2], dtype=np.int64).astype(np.uint64),
        )[0]
        d13 = hashing.hamming64(
            np.array([h1], dtype=np.int64).astype(np.uint64),
            np.array([h3], dtype=np.int64).astype(np.uint64),
        )[0]
        assert d12 <= 6
        assert d13 > 10

    def test_phash_band_keys(self):
        ph = np.array([123456789, 123456789, -987654], dtype=np.int64)
        keys = hashing.phash_band_keys(ph, bands=4)
        assert keys.shape == (3, 4)
        assert (keys[0] == keys[1]).all()


class TestUrls:
    # semantics from crawler.py:339-360 (see test/test_db.py link fixtures)
    @pytest.mark.parametrize(
        "raw,canon",
        [
            ("HTTP://Example.COM/Path/", "http://example.com/Path"),
            ("http://example.com/", "http://example.com/"),
            ("http://example.com/a#frag", "http://example.com/a"),
            ("http://example.com/a?q=1#frag", "http://example.com/a?q=1"),
            ("https://HOST9.example/img00000001", "https://host9.example/img00000001"),
        ],
    )
    def test_canonicalize(self, raw, canon):
        assert urls.canonicalize_url(raw) == canon

    def test_matches_urllib_reference_impl(self):
        # fast path must equal the reference's urlparse/urlunparse rebuild
        from urllib.parse import urlparse, urlunparse

        cases = [
            "HTTP://Example.COM/Path/To/?x=1&y=2#z",
            "http://h.example/",
            "http://h.example/a/b/c/",
            "https://h.example:8080/p?q=%20x",
        ]
        for u in cases:
            p = urlparse(u)
            path = p.path
            if path.endswith("/") and path != "/":
                path = path[:-1]
            expected = urlunparse(
                (p.scheme.lower(), p.netloc.lower(), path, p.params, p.query, "")
            )
            assert urls.canonicalize_url(u) == expected

    def test_hosts_and_buckets(self):
        us = ["http://host1.example/a", "http://HOST1.example/b", "http://host2.example/a"]
        hs = urls.hosts_of(us)
        assert hs == ["host1.example", "host1.example", "host2.example"]
        bk = urls.host_buckets(hs, 8)
        assert bk[0] == bk[1]
        assert 0 <= bk.min() and bk.max() < 8


class TestText:
    def test_token_counts(self):
        assert list(text.token_counts(["a b  c", "", "one"])) == [3, 0, 1]

    def test_bpe_tokens(self):
        assert text.bpe_tokens("Hello, world!") == ["Hello", ",", "world", "!"]

    def test_punct_and_stopword_ratios(self):
        pr = text.punct_ratios(["abc.", ""])
        assert pr[0] == pytest.approx(0.25)
        assert pr[1] == 0.0
        sr = text.stopword_ratios(["the cat sat on the mat"])
        assert sr[0] == pytest.approx(3 / 6)

    def test_quality_scores_bounds(self):
        qs = text.quality_scores(["the quick brown fox " * 30, "", "!!!!!!"])
        assert ((qs >= 0) & (qs <= 1)).all()
        assert qs[0] > qs[2]

    def test_lang_id(self):
        langs = text.lang_id(
            [
                "the house is over there and it is a good one with the dog",
                "der hund läuft über die straße und springt über den zaun",
                "le chien court dans la maison avec le chat paresseux",
                "",
            ]
        )
        assert langs[0] == "en"
        assert langs[1] == "de"
        assert langs[2] == "fr"
        assert langs[3] == "und"

    def test_shingles_and_jaccard(self):
        assert text.word_shingles("a b c d", 3) == ["a b c", "b c d"]
        assert text.char_shingles("ab", 5) == ["ab"]
        assert text.ngram_jaccard("a b c d", "a b c d") == 1.0
        assert text.ngram_jaccard("a b c d", "x y z w") == 0.0

    def test_rolling_fingerprint_deterministic(self):
        f1 = text.rolling_fingerprint(["some document body here", "x"])
        f2 = text.rolling_fingerprint(["some document body here", "x"])
        assert f1 == f2
        assert len(f1[0]) == 4


class TestCodecs:
    def test_png_roundtrip_lossless(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        data = codecs.encode_image(img, "png")
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = codecs.decode_image(data, "png")
        assert (out == img).all()

    def test_lossy_roundtrip_psnr(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        data = codecs.encode_image(img, "jpeg")
        out = codecs.decode_image(data, "jpeg")
        p = codecs.psnr(img, out)
        assert 40.0 <= p < 60.0  # the BASELINE.json PSNR≥40dB lossy gate

    def test_decode_sniffs_format(self):
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        assert (codecs.decode_image(codecs.encode_image(img, "png")) == img).all()
        assert codecs.psnr(codecs.decode_image(codecs.encode_image(img, "jpeg")), img) > 40

    def test_psnr_identical_inf(self):
        img = np.ones((8, 8, 3), dtype=np.uint8)
        assert codecs.psnr(img, img) == float("inf")

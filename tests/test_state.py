"""Unit tests: bloom seen-filter, M13 priority scorer, crawl semantics helpers."""

from __future__ import annotations

import numpy as np

from ieps_crawler_ray.functions.priority import (
    NON_ANCHOR_PRIORITY,
    link_priorities,
    link_priority,
)
from ieps_crawler_ray.semantics import link_seq
from ieps_crawler_ray.state.seen_filter import BloomFilter


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    keys = np.arange(5_000, dtype=np.uint64) * np.uint64(2654435761)
    bf.add_many(keys)
    assert bf.contains_many(keys).all(), "bloom filters must never false-negative"


def test_bloom_fp_rate_reasonable():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01)
    rng = np.random.default_rng(7)
    bf.add_many(rng.integers(0, 2**63, 10_000, dtype=np.uint64))
    probe = rng.integers(2**63, 2**64 - 1, 20_000, dtype=np.uint64)
    fp = bf.contains_many(probe).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f} way above target"


def test_bloom_roundtrip_and_merge():
    a = BloomFilter(capacity=1000)
    b = BloomFilter(capacity=1000)
    ka = np.array([1, 2, 3], dtype=np.uint64)
    kb = np.array([100, 200], dtype=np.uint64)
    a.add_many(ka)
    b.add_many(kb)
    c = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    assert c.contains_many(np.concatenate([ka, kb])).all()


def test_cuckoo_no_false_negatives_and_delete():
    from ieps_crawler_ray.state.seen_filter import CuckooFilter

    cf = CuckooFilter(capacity=10_000)
    keys = np.arange(5_000, dtype=np.uint64) * np.uint64(2654435761)
    cf.add_many(keys)
    assert cf.contains_many(keys).all(), "inserted keys must never read absent"
    # delete the first half (keys KNOWN inserted) — they drop out, rest stay
    cf.delete_many(keys[:2_500])
    assert cf.contains_many(keys[2_500:]).all()
    fp = cf.contains_many(keys[:2_500]).mean()
    assert fp < 0.05, f"deleted keys still matching at {fp:.3f}"


def test_cuckoo_fp_rate_and_roundtrip():
    from ieps_crawler_ray.state.seen_filter import CuckooFilter, seen_filter_from_bytes

    cf = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(7)
    cf.add_many(rng.integers(0, 2**63, 10_000, dtype=np.uint64))
    probe = rng.integers(2**63, 2**64 - 1, 20_000, dtype=np.uint64)
    fp = cf.contains_many(probe).mean()
    assert fp < 0.01, f"16-bit-fingerprint fp rate {fp:.4f} above target"
    back = seen_filter_from_bytes(cf.to_bytes())
    assert isinstance(back, CuckooFilter)
    assert (back.table == cf.table).all()


def test_seen_filter_factory_and_blob_dispatch():
    import os

    from ieps_crawler_ray.state.seen_filter import (
        BloomFilter,
        CuckooFilter,
        make_seen_filter,
        seen_filter_from_bytes,
    )

    assert isinstance(make_seen_filter(1000), BloomFilter)
    os.environ["IEPS_SEEN_FILTER"] = "cuckoo"
    try:
        assert isinstance(make_seen_filter(1000), CuckooFilter)
    finally:
        del os.environ["IEPS_SEEN_FILTER"]
    # legacy bloom blobs stay loadable through the dispatching loader
    bf = BloomFilter(capacity=1000)
    bf.add_many(np.array([5, 6], dtype=np.uint64))
    back = seen_filter_from_bytes(bf.to_bytes())
    assert isinstance(back, BloomFilter)
    assert back.contains_many(np.array([5, 6], dtype=np.uint64)).all()


def test_priority_keyword_match_scores_lower():
    """Reference semantics (Estrella.py:398-428): priority = 1 - max cosine;
    keyword anchors must sort before non-keyword anchors."""
    kw = ("vector", "image")
    with_kw = link_priority("big vector scan plan", kw)
    without = link_priority("big table scan plan", kw)
    assert with_kw < without
    # closed form: count/||counts||; 4 distinct tokens → 1 - 1/2
    assert abs(with_kw - (1 - 0.5)) < 1e-12
    assert without == 1.0


def test_priority_empty_anchor_gets_default():
    assert link_priority("", ("x",)) == NON_ANCHOR_PRIORITY
    assert link_priority("the a", ("x",)) == NON_ANCHOR_PRIORITY  # stopwords only


def test_priority_batch_matches_scalar():
    anchors = ["vector stream", "", "row row row vector"]
    kw = ("vector",)
    batch = link_priorities(anchors, kw)
    assert list(batch) == [link_priority(a, kw) for a in anchors]


def test_link_seq_monotone_in_discovery_order():
    s = [link_seq(r, j) for r in range(3) for j in range(5)]
    assert s == sorted(s) and len(set(s)) == len(s)
    assert link_seq(0, 0) > 10  # never collides with seed seqs (= seed index)


def test_band_key_cap_bounds_flood_verify():
    """SCALE.md debt #3: with band_key_cap set, a crafted band-key flood
    (every row sharing one pHash band key) verifies each new row against at
    most cap oldest rows + the new set — bounded work, deterministic edges,
    and dups of OLD winners are still caught (winners are oldest)."""
    import numpy as np
    import pyarrow as pa

    from ieps_crawler_ray.pipelines.crawl import _verify_bucket

    m = 500
    ranks = np.arange(m, dtype=np.int64)
    group = pa.table(
        {
            "band_key": pa.array(np.full(m, 42, dtype=np.uint64), pa.uint64()),
            "rank": pa.array(ranks, pa.int64()),
            "family": pa.array(np.full(m, 2, dtype=np.int8), pa.int8()),
            # identical phash → every pair is a (Hamming 0) duplicate
            "phash": pa.array(np.full(m, 7, dtype=np.int64), pa.int64()),
            "is_new": pa.array(ranks >= m - 5),  # last 5 rows are new
        }
    )
    sig_of = lambda r: np.zeros(200, dtype=np.uint32)  # unused (family 2)
    capped = _verify_bucket(group, sig_of, band_key_cap=10)
    uncapped = _verify_bucket(group, sig_of)
    # uncapped: each of 5 new rows pairs with every older row
    assert uncapped.num_rows == sum(m - 5 + i for i in range(5))
    # capped: each new row pairs only with the 10 oldest + earlier new rows
    assert capped.num_rows == sum(10 + i for i in range(5))
    # oldest winners still found first
    assert capped["rank_a"].to_numpy().min() == 0
    # deterministic
    assert capped.equals(_verify_bucket(group, sig_of, band_key_cap=10))


def test_hll_accuracy_and_merge():
    from ieps_crawler_ray.state import sketches

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**62, 50_000, dtype=np.uint64)
    exact = len(np.unique(vals))
    # single-shot estimate within the 4096-register error envelope
    est = sketches.estimate(sketches.registers(vals))
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # merge of arbitrary splits == whole (partition independence)
    parts = np.array_split(vals, 7)
    merged = sketches.merge([sketches.registers(p) for p in parts])
    assert sketches.estimate(merged) == est
    # idempotent under re-merge (task-retry safety)
    remerged = sketches.merge([merged, sketches.registers(parts[0])])
    assert sketches.estimate(remerged) == est


def test_hll_small_range_linear_counting():
    from ieps_crawler_ray.state import sketches

    vals = np.arange(100, dtype=np.uint64)
    est = sketches.estimate(sketches.registers(vals))
    assert abs(est - 100) <= 5, est


def test_verify_subtasks_skew_aware():
    """Uniform buckets never split (a blanket split multiplies wave CPU);
    a flood bucket splits in proportion to its share; env override forces
    a uniform S for every bucket."""
    import os

    from ieps_crawler_ray.pipelines.crawl import _verify_subtasks

    assert set(_verify_subtasks({b: 100 for b in range(32)}, 16).values()) == {1}
    counts = {b: 10 for b in range(31)}
    counts[31] = 10_000
    sb = _verify_subtasks(counts, 16)
    assert 1 < sb[31] <= 8
    assert all(v == 1 for b, v in sb.items() if b != 31)
    assert set(_verify_subtasks(counts, 1).values()) == {1}  # narrow pool: no split
    # measured-seconds feedback: a bucket whose LAST-wave cost exceeded the
    # fair share splits even at uniform counts (and cheap buckets never do)
    secs = {b: 0.5 for b in range(32)}
    secs[7] = 4.0  # 4.0 / (19.5 / 16) ≈ 3.3 → S = 4
    sb = _verify_subtasks({b: 100 for b in range(32)}, 16, secs=secs)
    assert sb[7] == 4
    assert all(v == 1 for b, v in sb.items() if b != 7)
    # seconds for buckets absent this generation are ignored
    sb = _verify_subtasks({b: 100 for b in range(32)}, 16, secs={99: 100.0})
    assert set(sb.values()) == {1}
    os.environ["IEPS_VERIFY_SPLIT"] = "3"
    try:
        assert set(_verify_subtasks(counts, 16).values()) == {3}
    finally:
        del os.environ["IEPS_VERIFY_SPLIT"]

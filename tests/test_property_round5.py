"""Property-based gates (hypothesis) for round-5 kernels: the PAVA isotonic
projection, the capped band-pair flood guard, and the Poisson-bootstrap
weight hash. Pure kernel tests — no Ray session needed."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ieps_crawler_ray.functions.hashing import capped_band_pairs
from ieps_crawler_ray.pipelines.analytics import _pava

floats = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)
weights = st.floats(min_value=0.1, max_value=1e3, allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(floats, weights), min_size=1, max_size=40))
def test_pava_properties(pairs):
    y = np.array([p[0] for p in pairs])
    w = np.array([p[1] for p in pairs])
    fit = _pava(y, w)
    # 1. isotonic: nondecreasing output
    assert (np.diff(fit) >= -1e-9).all()
    # 2. projection: idempotent
    assert np.allclose(_pava(fit, w), fit, atol=1e-9)
    # 3. weighted mean preserved (block means are weighted averages)
    assert math.isclose(float((fit * w).sum()), float((y * w).sum()),
                        rel_tol=1e-9, abs_tol=1e-6)
    # 4. already-sorted input is a fixed point
    ys = np.sort(y)
    assert np.allclose(_pava(ys, w), ys)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 2**64 - 1)),
        min_size=2,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(0, 5),
)
def test_capped_band_pairs_exact_mode_matches_bruteforce(rows, threshold):
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    ph = np.array([r[1] for r in rows], dtype=np.uint64)
    a, b, h = capped_band_pairs(ids, ph, threshold, cap=0)
    got = set(zip(a.tolist(), b.tolist(), h.tolist()))
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                d = bin(int(ph[i]) ^ int(ph[j])).count("1")
                if d <= threshold:
                    want.add((int(ids[i]), int(ids[j]), d))
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 2**64 - 1)),
        min_size=2,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 4),
)
def test_capped_band_pairs_cap_is_subset_and_bounded(rows, cap):
    """Capped output ⊆ exact output, obeys the O(cap·n) bound, and keeps
    every edge whose anchor is among the cap oldest ids."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    ph = np.array([r[1] for r in rows], dtype=np.uint64)
    a0, b0, h0 = capped_band_pairs(ids, ph, 3, cap=0)
    exact = set(zip(a0.tolist(), b0.tolist(), h0.tolist()))
    a, b, h = capped_band_pairs(ids, ph, 3, cap=cap)
    got = set(zip(a.tolist(), b.tolist(), h.tolist()))
    assert got <= exact
    n = len(ids)
    assert len(got) <= sum(max(n - 1 - i, 0) for i in range(cap))
    oldest = set(np.sort(ids)[:cap].tolist())
    assert {e for e in exact if e[0] in oldest} <= got


def test_bootstrap_weights_are_poisson_like_and_deterministic():
    """The splitmix64-seeded Poisson(1) weights: deterministic, mean ≈ 1,
    variance ≈ 1 over a large key set, independent of key order."""
    cdf = np.cumsum([np.exp(-1.0) / math.factorial(k) for k in range(9)])
    keys = np.arange(200_000, dtype=np.uint64)

    def wts(keys, r):
        with np.errstate(over="ignore"):
            z = keys * np.uint64(0x9E3779B97F4A7C15) + np.uint64(
                (r * 0xC2B2AE3D27D4EB4F) % 2**64
            )
            z ^= z >> np.uint64(30)
            z *= np.uint64(0xBF58476D1CE4E5B9)
            z ^= z >> np.uint64(27)
            z *= np.uint64(0x94D049BB133111EB)
            z ^= z >> np.uint64(31)
            u = z.astype(np.float64) / float(2**64)
        return np.searchsorted(cdf, u).astype(np.float64)

    w0 = wts(keys, 0)
    w0b = wts(keys[::-1], 0)[::-1]
    assert np.array_equal(w0, w0b)  # order-independent (pure key function)
    assert abs(w0.mean() - 1.0) < 0.01
    assert abs(w0.var() - 1.0) < 0.02
    w1 = wts(keys, 1)
    assert not np.array_equal(w0, w1)  # replicates differ

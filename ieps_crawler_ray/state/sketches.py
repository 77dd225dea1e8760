"""Mergeable cardinality sketch (HyperLogLog) for approximate COUNT DISTINCT.

At 100 TB an exact distinct over a high-cardinality key (users, URLs) is an
all-to-all shuffle of every distinct value; the HLL register array is the
standard scale substitute: each ``map_batches`` call folds its batch into a
fixed 4 KiB register blob, the groupby moves ONE blob per (key, batch), and
merge is an elementwise max — associative, commutative, idempotent, so the
estimate is independent of partitioning and retry history (safe under Ray's
task retries).

Pure-numpy, exact integer math (no float in the per-value path): splitmix64
hash → low ``P`` bits pick a register, trailing-zero rank of the remaining
bits via a popcount table. Deterministic for a fixed seed, so results are
golden-pinnable. Standard estimator with the linear-counting small-range
correction (Flajolet et al., AOFA 2007).
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import HASH_SEED, U64, mix2

P = 12
M = 1 << P  # 4096 registers, ~1.6 % relative error
_MAX_RANK = 64 - P + 1

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _ctz64(w: np.ndarray) -> np.ndarray:
    """Trailing zeros of each uint64 (exact: popcount((w & -w) - 1))."""
    with np.errstate(over="ignore"):
        iso = w & (np.uint64(0) - w)  # lowest set bit (0 if w == 0)
        mask = iso - U64(1)  # ones below it (all-ones if w == 0)
    by = mask.view(np.uint8).reshape(-1, 8)
    return _POP8[by].sum(axis=1, dtype=np.int64)


def registers(values: np.ndarray, seed: int = HASH_SEED) -> np.ndarray:
    """Fold a value array into a fresh uint8[M] register blob."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = mix2(np.asarray(values, dtype=np.uint64), np.uint64(seed))
    idx = (h & U64(M - 1)).astype(np.int64)
    w = h >> np.uint64(P)
    rank = np.minimum(_ctz64(w) + 1, _MAX_RANK).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def merge(blobs) -> np.ndarray:
    """Elementwise-max merge of register blobs (bytes or uint8 arrays)."""
    out = np.zeros(M, dtype=np.uint8)
    for b in blobs:
        arr = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b
        np.maximum(out, arr, out=out)
    return out


def estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the linear-counting small-range correction."""
    regs = np.asarray(regs, dtype=np.uint8)
    alpha = 0.7213 / (1 + 1.079 / M)
    e = alpha * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * M and zeros > 0:
        e = M * np.log(M / zeros)
    return int(round(e))


# ---------------------------------------------------------------- DDSketch ---
# Mergeable RELATIVE-error quantile sketch (Masson, Rim & Lee, VLDB 2019):
# positive values map to log-domain buckets ceil(log_gamma(x)) with
# gamma = (1+alpha)/(1-alpha), so every bucket's midpoint estimate
# 2*gamma^i/(gamma+1) is within alpha relative error of any value it holds.
# The sketch IS the (bucket, count) multiset — merge is a counts-sum, which
# a groupby Sum provides, making it associative/commutative/retry-safe like
# the HLL blob. One streaming pass, no prior min/max scan (unlike the exact
# histogram-refinement quantile), bucket count grows only logarithmically
# with the value range. Pure deterministic math — golden-pinnable.

DD_ALPHA = 0.01


def dd_buckets(values: np.ndarray, alpha: float = DD_ALPHA) -> tuple[np.ndarray, np.ndarray]:
    """Fold positive values into (bucket_index, count) pairs."""
    v = np.asarray(values, dtype=np.float64)
    if (v <= 0).any():
        raise ValueError("DDSketch handles positive values only")
    g = np.log((1 + alpha) / (1 - alpha))
    idx = np.ceil(np.log(v) / g).astype(np.int64)
    uk, cnt = np.unique(idx, return_counts=True)
    return uk, cnt.astype(np.int64)


def dd_quantiles(
    idx: np.ndarray, cnt: np.ndarray, qs, alpha: float = DD_ALPHA
) -> np.ndarray:
    """Quantile estimates from a merged (bucket, count) sketch. ``idx`` must
    be sorted ascending; uses the lower nearest-rank definition
    (rank = floor((n-1)·q), 0-based) to match quantile_disc."""
    idx = np.asarray(idx, dtype=np.int64)
    cnt = np.asarray(cnt, dtype=np.int64)
    gamma = (1 + alpha) / (1 - alpha)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = int((n - 1) * q)
        b = int(idx[np.searchsorted(cum, rank + 1)])
        out.append(2.0 * gamma**b / (gamma + 1))
    return np.array(out, dtype=np.float64)

"""Link-priority scorer — M13 in SURVEY §2.2 (Estrella.py:398-428, crawler.py:216-255).

Reference semantics: for each extracted link, build a CountVectorizer
(English stopwords removed) over [anchor-context, keyword] and take cosine
similarity; ``priority = 1 - max_k sim_k`` so keyword-matching links sort
first (lower priority value pops earlier, database.py:209-235). A keyword is
a single token, so its count vector is a unit basis vector and the cosine
reduces to ``count(kw in anchor) / ||anchor_counts||`` — re-implemented here
as that closed form (no sklearn dependency, exact same value).

Links with no usable anchor text score the reference's non-anchor default 0.5
(Estrella.py:550).
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np

from .text import STOPWORDS_EN

NON_ANCHOR_PRIORITY = 0.5
SEED_PRIORITY = 0.0  # frontier INSERT default (database.py:151-182, priority DEFAULT 0)


def link_priority(anchor: str, keywords: Sequence[str]) -> float:
    toks = [t for t in anchor.lower().split() if t not in STOPWORDS_EN]
    if not toks:
        return NON_ANCHOR_PRIORITY
    counts = Counter(toks)
    norm = float(np.sqrt(sum(c * c for c in counts.values())))
    best = max((counts.get(k, 0) / norm for k in keywords), default=0.0)
    return 1.0 - best


def link_priorities(anchors: Sequence[str], keywords: Sequence[str]) -> np.ndarray:
    """Batch scorer (runs inside map_batches link-extraction bodies).

    Vectorized form of :func:`link_priority` — per-anchor Counter loops were
    a measurable slice of the crawl's link stage. Tokens hash to 64 bits and
    counts derive from segmented run-lengths (lexsort + reduceat shape); a
    64-bit collision inside one ≤dozen-token anchor is the usual
    astronomically-safe trade. The scalar function above stays as the
    reference implementation (property-tested equal)."""
    from .hashing import hash64

    n = len(anchors)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    toks_per = [[t for t in a.lower().split() if t not in STOPWORDS_EN] for a in anchors]
    lens = np.fromiter((len(t) for t in toks_per), dtype=np.int64, count=n)
    out = np.full(n, NON_ANCHOR_PRIORITY, dtype=np.float64)
    total = int(lens.sum())
    if total == 0:
        return out
    flat = [t for toks in toks_per for t in toks]
    th = hash64(flat)
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((th, seg))
    seg_s, th_s = seg[order], th[order]
    new_run = np.concatenate(([True], (seg_s[1:] != seg_s[:-1]) | (th_s[1:] != th_s[:-1])))
    run_id = np.cumsum(new_run) - 1
    run_counts = np.bincount(run_id).astype(np.float64)
    run_seg = seg_s[new_run]
    sumsq = np.bincount(run_seg, weights=run_counts**2, minlength=n)
    nonempty = lens > 0
    norm = np.sqrt(sumsq)
    best = np.zeros(n, dtype=np.float64)
    for kh in (hash64(list(keywords)) if len(keywords) else []):
        m = th == kh
        if m.any():
            cnt = np.bincount(seg[m], minlength=n).astype(np.float64)
            np.maximum(best, cnt, out=best)
    out[nonempty] = 1.0 - best[nonempty] / norm[nonempty]
    return out

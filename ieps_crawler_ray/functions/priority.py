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
    """Batch scorer (runs inside map_batches link-extraction bodies)."""
    return np.fromiter(
        (link_priority(a, keywords) for a in anchors), dtype=np.float64, count=len(anchors)
    )

"""The crawl-semantics contract shared by the sequential oracle (oracle.py)
and the distributed Ray Data engine (pipelines/crawl.py).

Both sides import these *value definitions* — priorities, sequence numbers,
politeness budgets, the duplicate predicate — while executing completely
differently (heap loop vs. map_batches/groupby pipelines). Parity tests
(tests/test_crawl_parity.py) then check that the executions agree.

Semantics (deterministic generational best-first; reference mapping in
SURVEY §2.9/§7.5):

* The frontier holds ``(url, priority, discovered_seq)``; lower
  ``(priority, discovered_seq)`` crawls first — the reference's
  ``ORDER BY priority ASC, id ASC`` contract (database.py:209-235).
* Crawling proceeds in **generations** (the parallel reading of the
  reference's multi-worker DB-frontier loop, crawler.py:149-214). Per
  generation, scan the frontier in ``(priority, seq)`` order and admit a URL
  unless its host already used its politeness budget this generation
  (robots crawl-delay → ``slots_per_generation``, Estrella.py:472,
  crawler.py:204-210); stop at the global page budget. With politeness off
  and ``gen_page_cap=1`` this degenerates to the reference's sequential
  heap pop (Estrella.py:458-462) — proven in tests/test_oracle.py.
* Every admitted URL enters the **seen set** before the robots check
  (Estrella.py:467-477: visited-add precedes the can_fetch test); a
  disallowed URL yields a page row with status='disallowed' and no links.
* Duplicate detection (D2/D3, Estrella.py:223-257 + database.py:416-436):
  a fetched page is a DUPLICATE of the earliest prior non-duplicate page
  that is exact-equal (caption md5) OR MinHash-estimated Jaccard ≥ 0.8
  (200 perms over whitespace tokens) OR pHash Hamming ≤ PHASH_HAM_MAX.
  Duplicates contribute no links and never enter the similarity index
  (keep-oldest winner, ORDER BY accessed_time ASC LIMIT 1).
* Discovered links get ``seq = (parent_rank + 1) * 2^20 + link_index`` —
  deterministic insertion order under parallelism (SURVEY §7.5.1); seeds
  get ``seq = seed_index`` and priority 0.
* First discovery wins a frontier slot (D1); re-discovery of a seen or
  queued URL is dropped (crawler.py:873-898, Estrella.py:548-554).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .functions.hashing import MinHasher, hamming64
from .sources import corpus as C

MINHASH_PERMS = 200          # Estrella.py:584
MINHASH_THRESHOLD = 0.8      # Estrella.py:584
MINHASH_BANDS = 50           # 50 bands × 4 rows: est-J ≥ 0.8 ⇒ ≤ 40 unequal
#   positions ⇒ at most 40 dirty bands ⇒ ≥ 10 guaranteed-equal bands ⇒ the
#   LSH candidate step has NO false negatives at the 0.8 threshold (the
#   engine's banded shuffle finds exactly the pairs the oracle's linear scan
#   finds).
PHASH_HAM_MAX = 6            # near-dup image threshold
PHASH_BANDS = 8              # 8 bands × 8 bits: Hamming ≤ 7 ⇒ ≥ 1 equal band
SEQ_SHIFT = 20               # seq = (rank+1) << 20 | link_idx ; ≤ 2^20 links/page


@dataclass(frozen=True)
class CrawlParams:
    """One config consumed by BOTH the oracle and the engine."""

    spec: C.CorpusSpec
    seeds: tuple = ()            # canonical URLs; () → default_seeds()
    max_pages: int = 100
    politeness: bool = True      # per-host slots/generation from robots
    politeness_factor: int = 1   # budget multiplier (bigger = fewer, larger gens)
    gen_page_cap: int | None = None  # global per-generation admission cap
    keywords: tuple = C.DEFAULT_KEYWORDS
    sitemaps: bool = False       # S4: inject sitemap URLs on first host visit

    def host_budget(self, host_id: int) -> float:
        if not self.politeness:
            return float("inf")
        return C.robots_for_host(self.spec, host_id).crawl_delay_slots * self.politeness_factor


def default_seeds(spec: C.CorpusSpec, n: int = 4) -> tuple:
    """Seed list: the first URL of each of the first n hosts (the reference
    crawls from a per-domain seed list, main.py:84-87)."""
    b = C.host_boundaries(spec)
    idx = [int(b[h]) for h in range(min(n, spec.n_hosts))]
    return tuple(C.url_of_index(spec, np.array(idx)))


def link_seq(parent_rank: int, link_idx: int) -> int:
    return (parent_rank + 1) << SEQ_SHIFT | link_idx


SITEMAP_LINK_BASE = 1 << 19  # sitemap seq slots sit above any real link index


def sitemap_discoveries(spec: C.CorpusSpec, host_id: int, trigger_rank: int) -> list:
    """S4 injection rows for a first-visited host → (url, priority, seq, idx).

    Mirrors the reference's crawl_page preamble (crawler.py:588-594): the
    FIRST page crawled from a domain — regardless of its own robots/fetch
    outcome — triggers sitemap processing, and discovered URLs enter the
    frontier like links, with the non-anchor default priority
    (Estrella.py:550) and seq slots attributed to the triggering page
    above SITEMAP_LINK_BASE (so same-generation ties against real links
    resolve by seq, identically in oracle and engine)."""
    from .functions.priority import NON_ANCHOR_PRIORITY

    res = []
    for i, u in enumerate(C.sitemap_urls_for_host(spec, host_id)):
        idx = C.index_of_url(u)
        if idx < 0:
            continue
        res.append((u, NON_ANCHOR_PRIORITY, link_seq(trigger_rank, SITEMAP_LINK_BASE + i), idx))
    return res


_MINHASHER: MinHasher | None = None


def minhasher() -> MinHasher:
    """The one shared (seeded) MinHasher; 200 perms like the reference."""
    global _MINHASHER
    if _MINHASHER is None:
        _MINHASHER = MinHasher(num_perms=MINHASH_PERMS)
    return _MINHASHER


def similar(md5_a: str, sig_a: np.ndarray, ph_a: int,
            md5_b: str, sig_b: np.ndarray, ph_b: int) -> bool:
    """The duplicate predicate (exact OR MinHash OR pHash)."""
    if md5_a == md5_b:
        return True
    if MinHasher.jaccard(sig_a, sig_b) >= MINHASH_THRESHOLD:
        return True
    pha = np.array([ph_a], dtype=np.int64).astype(np.uint64)
    phb = np.array([ph_b], dtype=np.int64).astype(np.uint64)
    return int(hamming64(pha, phb)[0]) <= PHASH_HAM_MAX


@dataclass
class PageRecord:
    """One crawled page — the unit both sides must agree on."""

    rank: int
    gen: int
    url: str
    idx: int
    host_id: int
    priority: float
    seq: int
    status: str          # 'html' | 'disallowed' | 'duplicate' | 'binary' | 'error'
    dup_of: int = -1     # winner rank when status == 'duplicate'
    caption: str = ""
    phash: int = 0
    data_type: str = ""  # M4/M6 code when status == 'binary' (crawldb page_data)


@dataclass
class CrawlOutput:
    pages: list = field(default_factory=list)   # list[PageRecord] in crawl order
    seen: set = field(default_factory=set)      # canonical URLs
    links: list = field(default_factory=list)   # (from_rank, to_url) discovered edges
    n_generations: int = 0

    def order(self) -> list:
        return [p.url for p in self.pages]

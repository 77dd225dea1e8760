"""Sequential oracle crawler — the reference-semantics stand-in.

A tiny single-threaded crawler implementing SURVEY §2/§3 semantics exactly
the way the reference does (sorted-frontier scan, linear-scan duplicate
index like Estrella.py:594-603, immediate frontier pushes), with zero Ray /
zero distribution. The Ray engine (pipelines/crawl.py) must reproduce its
crawl order, URL-seen set, page statuses/dup links and captions byte-for-byte
(tests/test_crawl_parity.py) — this is the "matching the reference's crawl
ordering and URL-seen set" gate of BASELINE.json's north_rule, made runnable
in a sandbox with no Postgres and no network.

Two modes:
  * ``oracle_crawl(params)``      — generational semantics (semantics.py).
  * ``heap_crawl(params)``        — the reference's literal pop-1 heap loop
    (Estrella.py:458-578). tests/test_oracle.py proves
    ``oracle_crawl(politeness=False, gen_page_cap=1) == heap_crawl`` — i.e.
    the generational model *contains* the sequential reference behavior.
"""

from __future__ import annotations

import heapq
from typing import Callable

import numpy as np

from .functions.hashing import md5_hex
from .functions.priority import SEED_PRIORITY, link_priorities
from .semantics import (
    CrawlOutput,
    CrawlParams,
    PageRecord,
    default_seeds,
    link_seq,
    minhasher,
    similar,
    sitemap_discoveries,
)
from .sources import corpus as C


def table_fetcher(corpus_path: str) -> Callable[[int], tuple]:
    """idx -> (caption, phash) backed by the built corpus table (the same
    bytes the engine reads), loaded once without the heavy ``bytes`` column."""
    from .sources import lance_table as lt

    t = lt.read_pyarrow(corpus_path, columns=["image_id", "caption", "phash"])
    by_idx = {
        int(i[3:]): (c, p)
        for i, c, p in zip(
            t["image_id"].to_pylist(), t["caption"].to_pylist(), t["phash"].to_pylist()
        )
    }
    return by_idx.__getitem__


class _Dedup:
    """Linear-scan similarity index (mirrors Estrella's minhash_dict scan)."""

    def __init__(self):
        self.entries: list[tuple] = []  # (rank, md5, sig, phash)
        self.mh = minhasher()

    def check(self, rank: int, caption: str, phash: int):
        md5 = md5_hex([caption])[0]
        sig = self.mh.signatures([caption.split()])[0]
        for r2, md5_2, sig2, ph2 in self.entries:  # rank order ⇒ first hit = oldest
            if similar(md5, sig, phash, md5_2, sig2, ph2):
                return r2
        self.entries.append((rank, md5, sig, phash))
        return -1


def _seeds_of(params: CrawlParams):
    return params.seeds or default_seeds(params.spec)


def _expand(params, fetch, page: PageRecord, out: CrawlOutput):
    """Links of a fetched non-duplicate page → (url, priority, seq, idx, host)."""
    targets, anchors = C.out_links_of_index(params.spec, page.idx)
    prios = link_priorities(anchors, params.keywords)
    urls = C.url_of_index(params.spec, np.array(targets))
    res = []
    for j, (t, u, pr) in enumerate(zip(targets, urls, prios)):
        out.links.append((page.rank, u))
        res.append((u, float(pr), link_seq(page.rank, j), int(t)))
    return res


def _fetch_one(params, fetch, rank, gen, url, idx, host_id, prio, seq, dedup, out):
    """Shared per-URL step: seen-add, robots, content-type, fetch, dedup."""
    out.seen.add(url)
    policy = C.robots_for_host(params.spec, host_id)
    path = url.split(".example", 1)[1]
    if not policy.allowed(path):
        page = PageRecord(rank, gen, url, idx, host_id, prio, seq, "disallowed")
        out.pages.append(page)
        return page
    # M5: a binary content-type short-circuits HTML processing — page stored
    # as BINARY with its data-type code, no links, no dedup (crawler.py:630-645)
    from .functions.binary import binary_code

    ct = C.content_type_of_index(params.spec, [idx])[0]
    code = binary_code(ct)
    if code is not None:
        page = PageRecord(
            rank, gen, url, idx, host_id, prio, seq, "binary", data_type=code
        )
        out.pages.append(page)
        return page
    caption, phash = fetch(idx)
    dup_of = dedup.check(rank, caption, phash)
    status = "duplicate" if dup_of >= 0 else "html"
    page = PageRecord(rank, gen, url, idx, host_id, prio, seq, status, dup_of, caption, phash)
    out.pages.append(page)
    return page


def oracle_crawl(params: CrawlParams, fetch: Callable[[int], tuple] | None = None) -> CrawlOutput:
    """Generational best-first crawl (the engine's contract)."""
    if fetch is None:
        fetch = _default_fetch(params.spec)
    out = CrawlOutput()
    dedup = _Dedup()
    sm_done: set[int] = set()  # hosts whose sitemap was already processed
    # frontier: url -> (priority, seq, idx, host_id); first discovery wins
    frontier: dict[str, tuple] = {}
    for i, u in enumerate(_seeds_of(params)):
        idx = C.index_of_url(u)
        host = int(C.host_of_index(params.spec, np.array([idx]))[0])
        frontier.setdefault(u, (SEED_PRIORITY, i, idx, host))
    rank = 0
    while frontier and rank < params.max_pages:
        out.n_generations += 1
        gen = out.n_generations
        # --- admission: scan (priority, seq) order under per-host budgets
        entries = sorted(frontier.items(), key=lambda kv: (kv[1][0], kv[1][1]))
        used: dict[int, int] = {}
        cap = min(params.gen_page_cap or len(entries), params.max_pages - rank)
        admitted = []
        for url, (prio, seq, idx, host) in entries:
            if len(admitted) >= cap:
                break
            if used.get(host, 0) < params.host_budget(host):
                used[host] = used.get(host, 0) + 1
                admitted.append((url, prio, seq, idx, host))
        if not admitted:
            break
        new_links = []
        for url, prio, seq, idx, host in admitted:
            del frontier[url]
            if params.sitemaps and host not in sm_done:
                # S4: first page of a host triggers sitemap injection BEFORE
                # its own robots/fetch outcome (crawler.py:588-601)
                sm_done.add(host)
                new_links.extend(sitemap_discoveries(params.spec, host, rank))
            page = _fetch_one(params, fetch, rank, gen, url, idx, host, prio, seq, dedup, out)
            if page.status == "html":
                new_links.extend(_expand(params, fetch, page, out))
            rank += 1
        # --- frontier update: first-wins by discovery seq, minus seen
        for u, pr, sq, t in sorted(new_links, key=lambda x: x[2]):
            if u not in out.seen and u not in frontier:
                host = int(C.host_of_index(params.spec, np.array([t]))[0])
                frontier[u] = (pr, sq, t, host)
    return out


def heap_crawl(params: CrawlParams, fetch: Callable[[int], tuple] | None = None) -> CrawlOutput:
    """The reference's literal sequential loop: heappop one URL at a time,
    push discovered links immediately (Estrella.py:458-578). No politeness
    model (the reference's sleep changes timing, not order)."""
    if fetch is None:
        fetch = _default_fetch(params.spec)
    out = CrawlOutput()
    dedup = _Dedup()
    heap: list[tuple] = []
    queued: set[str] = set()
    for i, u in enumerate(_seeds_of(params)):
        idx = C.index_of_url(u)
        host = int(C.host_of_index(params.spec, np.array([idx]))[0])
        if u not in queued:
            heapq.heappush(heap, (SEED_PRIORITY, i, u, idx, host))
            queued.add(u)
    rank = 0
    sm_done: set[int] = set()
    while heap and rank < params.max_pages:
        prio, seq, url, idx, host = heapq.heappop(heap)
        queued.discard(url)
        if url in out.seen:
            continue
        if params.sitemaps and host not in sm_done:
            sm_done.add(host)
            for u, pr, sq, t in sitemap_discoveries(params.spec, host, rank):
                if u not in out.seen and u not in queued:
                    h2 = int(C.host_of_index(params.spec, np.array([t]))[0])
                    heapq.heappush(heap, (pr, sq, u, t, h2))
                    queued.add(u)
        page = _fetch_one(params, fetch, rank, rank + 1, url, idx, host, prio, seq, dedup, out)
        if page.status == "html":
            for u, pr, sq, t in _expand(params, fetch, page, out):
                if u not in out.seen and u not in queued:
                    h2 = int(C.host_of_index(params.spec, np.array([t]))[0])
                    heapq.heappush(heap, (pr, sq, u, t, h2))
                    queued.add(u)
        rank += 1
    out.n_generations = rank
    return out


def _default_fetch(spec: C.CorpusSpec) -> Callable[[int], tuple]:
    """Fetch by recomputing the corpus row (slow; tests pass table_fetcher)."""

    def fetch(idx: int) -> tuple:
        t = C.rows_for_indices(spec, [idx])
        return t["caption"][0].as_py(), t["phash"][0].as_py()

    return fetch

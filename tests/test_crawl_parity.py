"""Crawl-order / URL-seen parity: Ray engine vs sequential oracle.

This is the north_rule gate: "matching the reference's crawl ordering and
URL-seen set under the same seed list + politeness budget" — the oracle
(oracle.py) is the runnable stand-in for the reference's sequential
semantics (no Postgres / no network in this sandbox), and the engine must
reproduce it exactly: crawl order, page statuses, duplicate links, captions
byte-for-byte, and the seen set.
"""

from __future__ import annotations

import shutil

import pytest

from ieps_crawler_ray.oracle import heap_crawl, oracle_crawl, table_fetcher
from ieps_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from ieps_crawler_ray.semantics import CrawlParams
from ieps_crawler_ray.sources import corpus as C

SCRATCH = "/tmp/ieps_crawler_ray"

SPEC = C.CorpusSpec(n_images=500, n_hosts=10, num_buckets=4, neardup_permille=300)


@pytest.fixture(scope="session")
def corpus_path(ray_session):
    return C.build_corpus(SPEC, C.corpus_path(SCRATCH, SPEC))


@pytest.fixture(scope="session")
def fetch(corpus_path):
    return table_fetcher(corpus_path)


def _page_tuples(pages):
    """(rank, url, gen, status, dup_of, caption-as-stored, data_type) per page."""
    return [
        (
            p.rank,
            p.url,
            p.gen,
            p.status,
            p.dup_of,
            "" if p.status == "duplicate" else p.caption,
            p.data_type,
        )
        for p in pages
    ]


def _engine_tuples(res):
    pt = res.pages_table().to_pandas()
    return [
        (int(a), b, int(c), d, int(e), f, g)
        for a, b, c, d, e, f, g in zip(
            pt["rank"], pt["url"], pt["gen"], pt["status"], pt["dup_of"], pt["caption"],
            pt["data_type"],
        )
    ]


def _run_engine(params, corpus_path, root, **cfg_kw):
    shutil.rmtree(root, ignore_errors=True)
    cfg = CrawlConfig(params=params, root=root, **cfg_kw)
    return run_crawl(cfg, corpus_path=corpus_path)


def test_generational_cap1_equals_reference_heap_loop(fetch):
    """The generational model with politeness off and a 1-page generation cap
    IS the reference's sequential pop-1 heap loop (Estrella.py:458-462)."""
    params = CrawlParams(spec=SPEC, max_pages=150, politeness=False, gen_page_cap=1)
    a = oracle_crawl(params, fetch)
    b = heap_crawl(params, fetch)
    assert a.order() == b.order()
    assert a.seen == b.seen
    assert _page_tuples(a.pages) == _page_tuples(b.pages)


def test_engine_matches_oracle_with_politeness(corpus_path, fetch):
    """Full semantics: per-host politeness budgets, robots disallows,
    MinHash/pHash near-dup — engine output must equal the oracle exactly."""
    params = CrawlParams(spec=SPEC, max_pages=200, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    statuses = {p.status for p in oracle.pages}
    assert statuses >= {"html", "duplicate"}, "test corpus must exercise dedup"
    res = _run_engine(params, corpus_path, f"{SCRATCH}/ckpt-parity")
    assert res.finished and res.n_pages == len(oracle.pages)
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_matches_oracle_distributed_paths(corpus_path, fetch):
    """driver_path_max_rows=0 forces the DISTRIBUTED branch of every
    adaptive stage (admission shuffle, map_batches links, groupby frontier
    merge, Dataset frontier rewrite) — identical output to the driver-path
    run and to the oracle."""
    params = CrawlParams(spec=SPEC, max_pages=150, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(
        params, corpus_path, f"{SCRATCH}/ckpt-dist", driver_path_max_rows=0
    )
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_exact_url_confirm_parity(corpus_path, fetch):
    """exact_url_confirm=True (SCALE.md hash-identity risk → flag): the
    string-confirmed anti-joins must be a no-op on a collision-free corpus —
    byte-identical output to the oracle with the flag on."""
    params = CrawlParams(spec=SPEC, max_pages=150, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(
        params, corpus_path, f"{SCRATCH}/ckpt-exactconfirm", exact_url_confirm=True
    )
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_wide_captions_route_distributed_below_row_cap(corpus_path, fetch):
    """Byte-aware path switch (VERDICT r3 item 4): with a tiny byte budget
    and a huge row cap, generation 1 (no width estimate yet) may use the
    driver path, but every later generation must route DISTRIBUTED even
    though the admitted row count is far below driver_path_max_rows —
    and the output must still match the oracle."""
    from ieps_crawler_ray.pipelines.crawl import _gd, _gens_of
    from ieps_crawler_ray.sources import lance_table as lt

    params = CrawlParams(spec=SPEC, max_pages=120, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    root = f"{SCRATCH}/ckpt-bytegate"
    res = _run_engine(
        params, corpus_path, root, driver_path_max_rows=2_000_000, driver_path_max_bytes=1
    )
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen
    gens = _gens_of(root, "metrics")
    assert len(gens) >= 2, "needs multiple generations to exercise the estimate"
    paths = []
    for g in gens:
        m = lt.read_pyarrow(_gd(root, "metrics", g)).to_pydict()
        assert m["n_admitted"][0] < 2_000_000
        assert m["caption_bytes"][0] >= 0
        paths.append(m["gen_path"][0])
    assert all(p == "dist" for p in paths[1:]), paths


def test_engine_matches_oracle_no_politeness(corpus_path, fetch):
    """politeness=False admission branch (global best-first prefix)."""
    params = CrawlParams(spec=SPEC, max_pages=120, politeness=False, gen_page_cap=40)
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(params, corpus_path, f"{SCRATCH}/ckpt-nopol")
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_with_seen_compaction(corpus_path, fetch):
    """Folding per-generation seen tables (compact_seen_every=2) must not
    change crawl results — the anti-join is a union over generations."""
    params = CrawlParams(spec=SPEC, max_pages=150, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(
        params, corpus_path, f"{SCRATCH}/ckpt-compact", compact_seen_every=2
    )
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen
    from ieps_crawler_ray.pipelines.crawl import _gens_of

    assert len(_gens_of(f"{SCRATCH}/ckpt-compact", "seen")) < res.n_generations
    # the dedup index compacts on the same cadence (SCALE.md debt #4)
    assert len(_gens_of(f"{SCRATCH}/ckpt-compact", "bands")) < res.n_generations


def test_engine_resume_from_checkpoint(corpus_path, fetch):
    """Stop after 2 generations, resume in a new run: final state equals an
    uninterrupted crawl (per-partition lineage / resumable restarts)."""
    params = CrawlParams(spec=SPEC, max_pages=120, politeness=True, politeness_factor=3)
    root = f"{SCRATCH}/ckpt-resume"
    shutil.rmtree(root, ignore_errors=True)
    partial = run_crawl(
        CrawlConfig(params=params, root=root, max_generations=2), corpus_path=corpus_path
    )
    assert not partial.finished
    resumed = run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus_path)
    assert resumed.finished
    oracle = oracle_crawl(params, fetch)
    assert _engine_tuples(resumed) == _page_tuples(oracle.pages)
    assert resumed.seen_urls() == oracle.seen


def test_engine_rollback_of_uncommitted_generation(corpus_path, fetch):
    """A generation written without a state.json commit (simulated crash)
    is rolled back on resume and re-run identically."""
    import json
    import os

    params = CrawlParams(spec=SPEC, max_pages=100, politeness=True, politeness_factor=3)
    root = f"{SCRATCH}/ckpt-crash"
    shutil.rmtree(root, ignore_errors=True)
    run_crawl(CrawlConfig(params=params, root=root, max_generations=3), corpus_path=corpus_path)
    # simulated crash: state says gen 2 even though gen 3 tables exist
    with open(os.path.join(root, "state.json")) as f:
        st = json.load(f)
    pages3 = json.load(open(os.path.join(root, "pages", "gen3", "_manifest.json")))
    st["gen"], st["rank"] = 2, st["rank"] - pages3["num_rows"]
    with open(os.path.join(root, "state.json"), "w") as f:
        json.dump(st, f)
    resumed = run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus_path)
    oracle = oracle_crawl(params, fetch)
    assert _engine_tuples(resumed) == _page_tuples(oracle.pages)
    assert resumed.seen_urls() == oracle.seen


def test_engine_matches_oracle_1000_pages(ray_session):
    """Larger-scale parity: 1 000 pages over a 1 500-image corpus — more
    generations, deeper dedup index, compaction active."""
    spec = C.CorpusSpec(n_images=1_500, n_hosts=12, num_buckets=8, neardup_permille=200)
    path = C.build_corpus(spec, C.corpus_path(SCRATCH, spec))
    fetch = table_fetcher(path)
    params = CrawlParams(spec=spec, max_pages=1_000, politeness=True, politeness_factor=6)
    oracle = oracle_crawl(params, fetch)
    assert {p.status for p in oracle.pages} >= {"html", "duplicate"}
    res = _run_engine(params, path, f"{SCRATCH}/ckpt-big", compact_seen_every=4)
    assert res.n_pages == len(oracle.pages) == 1_000
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_metrics_written_per_generation(corpus_path):
    from ieps_crawler_ray.pipelines.crawl import _gd, _gens_of
    from ieps_crawler_ray.sources import lance_table as lt

    root = f"{SCRATCH}/ckpt-parity"  # written by the politeness test
    gens = _gens_of(root, "metrics")
    assert gens, "metrics checkpoints missing"
    m = lt.read_pyarrow(_gd(root, "metrics", gens[0])).to_pydict()
    for col in ("n_admitted", "n_html", "n_duplicate", "n_disallowed", "n_links", "secs"):
        assert col in m


def test_bloom_files_sparse_only_touched_buckets(corpus_path, fetch):
    """A generation's bloom dir contains files ONLY for buckets that admitted
    rows that generation; untouched buckets keep (and resolve to) their
    earlier file instead of being rewritten (the round-1 rewrite-all loop
    was ~100 GB/gen of driver I/O at the 64k-bucket design point)."""
    import json
    import os

    from ieps_crawler_ray.pipelines.crawl import _gd, _gens_of
    from ieps_crawler_ray.sources import lance_table as lt

    params = CrawlParams(spec=SPEC, max_pages=60, politeness=True, politeness_factor=2)
    root = f"{SCRATCH}/ckpt-bloomsparse"
    res = _run_engine(params, corpus_path, root, max_generations=3)
    assert res.n_generations >= 2
    with open(os.path.join(root, "state.json")) as f:
        st = json.load(f)
    n_buckets = CrawlConfig(params=params, root=root).num_uh_buckets
    assert len(st["bloom_gen"]) == n_buckets
    any_sparse = False
    for gen in _gens_of(root, "seen"):
        bloom_dir = os.path.join(root, "blooms", f"gen{gen}")
        if not os.path.isdir(bloom_dir):
            continue  # fully superseded dir, GC'd after a later commit
        touched = {
            fr["partition"]
            for fr in lt.read_manifest(_gd(root, "seen", gen))["fragments"]
        }
        on_disk = {
            int(fn[6:-4]) for fn in os.listdir(bloom_dir) if fn.startswith("bloom-")
        }
        assert on_disk == touched, f"gen{gen}: bloom files {on_disk} != touched {touched}"
        if len(on_disk) < n_buckets:
            any_sparse = True
    assert any_sparse, "every generation touched every bucket — test corpus too dense"
    # the committed map must resolve every bucket to an existing file
    for b, g in enumerate(st["bloom_gen"]):
        assert os.path.exists(os.path.join(root, "blooms", f"gen{g}", f"bloom-{b}.bin"))


def test_engine_matches_oracle_with_sitemaps(corpus_path, fetch):
    """S4 parity: sitemap injection on first host visit — engine and oracle
    must agree on crawl order / statuses / seen with the channel ON, and the
    channel must actually fire (URLs crawled that only a sitemap reveals)."""
    from ieps_crawler_ray.semantics import SEQ_SHIFT, SITEMAP_LINK_BASE

    params = CrawlParams(
        spec=SPEC, max_pages=150, politeness=True, politeness_factor=3, sitemaps=True
    )
    oracle = oracle_crawl(params, fetch)
    sm_pages = [
        p for p in oracle.pages if (p.seq & ((1 << SEQ_SHIFT) - 1)) >= SITEMAP_LINK_BASE
    ]
    assert sm_pages, "no sitemap-discovered URL was crawled — corpus/params too small"
    res = _run_engine(params, corpus_path, f"{SCRATCH}/ckpt-sitemap")
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_sitemaps_distributed_branch(corpus_path, fetch):
    """Same parity with driver_path_max_rows=0 (every driver shortcut off):
    sitemap candidates must survive the distributed merge path too."""
    params = CrawlParams(
        spec=SPEC, max_pages=80, politeness=True, politeness_factor=2, sitemaps=True
    )
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(
        params, corpus_path, f"{SCRATCH}/ckpt-sitemap-dist", driver_path_max_rows=0
    )
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_matches_oracle_with_binary_pages(ray_session):
    """M5 BINARY page type: a corpus where ~8% of URLs serve binary
    content-types — binary pages store their data-type code, produce no
    links, never enter the dedup index, and engine == oracle exactly."""
    spec = C.CorpusSpec(
        n_images=500, n_hosts=10, num_buckets=4, neardup_permille=300, binary_permille=80
    )
    path = C.build_corpus(spec, C.corpus_path(SCRATCH, spec))
    fetch = table_fetcher(path)
    params = CrawlParams(spec=spec, max_pages=150, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    statuses = {p.status for p in oracle.pages}
    assert "binary" in statuses, "corpus/params produced no binary pages"
    codes = {p.data_type for p in oracle.pages if p.status == "binary"}
    assert codes and all(codes)
    res = _run_engine(params, path, f"{SCRATCH}/ckpt-binary")
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen


def test_engine_matches_oracle_with_cuckoo_seen_filter(corpus_path, fetch, monkeypatch):
    """IEPS_SEEN_FILTER=cuckoo swaps the seen pre-filter backend (north_rule:
    "bloom/cuckoo URL-seen filters"); the exact per-bucket anti-join stays
    authoritative, so the crawl must be byte-identical to the oracle AND to
    the bloom-backed run, including across a resume that reloads the cuckoo
    blobs from the generation-stamped checkpoint files."""
    monkeypatch.setenv("IEPS_SEEN_FILTER", "cuckoo")
    params = CrawlParams(spec=SPEC, max_pages=200, politeness=True, politeness_factor=3)
    oracle = oracle_crawl(params, fetch)
    res = _run_engine(params, corpus_path, f"{SCRATCH}/ckpt-cuckoo")
    assert res.finished and res.n_pages == len(oracle.pages)
    assert _engine_tuples(res) == _page_tuples(oracle.pages)
    assert res.seen_urls() == oracle.seen

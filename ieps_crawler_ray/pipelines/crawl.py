"""The Ray-Data-native crawl engine: sharded URL frontier + fetch scheduler.

Implements the generational best-first semantics of ``semantics.py`` (the
contract proven against the sequential oracle in tests/test_crawl_parity.py)
as a sequence of Ray Data pipelines per generation — the engine's "how" is
entirely Dataset/map_batches/groupby; nothing here mirrors the reference's
threaded loop (SURVEY §3.1) structurally.

Per-generation dataflow (SURVEY §7.4 shuffle plan)::

    frontier ckpt (Lance layout, partitioned by url_hash bucket)
      └─ admission:   map_batches per-host pre-prune (combiner)
                      → groupby(host_id).map_groups(top-budget)     [shuffle 1]
                      → sort(priority, seq) → limit(cap)            [shuffle 2]
      └─ fetch:       groupby(part).map_groups(fetch)               [shuffle 3]
                      part = host-affine bucket, hot hosts salted into
                      sub-parts (north_rule skew-splitting); "fetch" reads
                      only the matching corpus partition, columns pruned
      └─ dedup:       map_batches(signatures) → banded index join
                      groupby(band_key) over new ∪ pruned-old bands [shuffle 4]
                      → verified similarity edges → sequential winner
                      resolution (driver; edge count is dup-rate bounded)
      └─ links:       map_batches(extract + canonicalize + M13 score)
      └─ frontier′:   old frontier minus admitted (broadcast filter, no
                      shuffle) ∪ new links first-wins + seen anti-join per
                      url_hash bucket (bloom pre-filter → exact check)
                                                                    [shuffle 5]

Scale notes (10^10-URL frontier):
  * Only the *admitted* set of a generation is ever driver-materialized; its
    size is bounded by the politeness budget (Σ host slots), not by data
    size. Frontier / seen / pages / bands / links stay distributed.
  * Every checkpoint table is partitioned (url_hash bucket, band bucket, or
    generation), written atomically via the Lance-layout manifest — a crashed
    generation is invisible and rolled back on resume (per-partition
    lineage, north_rule).
  * The seen anti-join reads only the url_hash-bucket partitions that new
    links actually hash into, after a per-bucket bloom pre-filter; the exact
    per-bucket join stays authoritative (bloom false positives cost a read,
    never a wrong drop — SURVEY §7.5.2).
  * The banded dedup index is read partition-pruned to the band buckets
    present in the generation's new pages.

Reference parity citations: admission order database.py:209-235; seen-before-
robots Estrella.py:467-477; dup semantics Estrella.py:223-257 +
database.py:416-436; first-wins frontier crawler.py:873-898.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hamming64, hash64, phash_band_keys
from ..functions.priority import SEED_PRIORITY, link_priorities
from ..functions.urls import paths_of
from ..semantics import (
    MINHASH_BANDS,
    MINHASH_THRESHOLD,
    PHASH_BANDS,
    PHASH_HAM_MAX,
    SEQ_SHIFT,
    CrawlParams,
    default_seeds,
    link_seq,
    minhasher,
    sitemap_discoveries,
)
from ..sources import corpus as C
from ..sources import lance_table as lt
from ..state.seen_filter import make_seen_filter, seen_filter_from_bytes

FRONTIER_COLS = ["url", "url_hash", "idx", "host_id", "priority", "seq", "uh_bucket"]


@dataclass
class CrawlConfig:
    params: CrawlParams
    root: str                      # checkpoint root directory
    num_uh_buckets: int = 16       # url_hash partitions (seen/frontier)
    num_bk_buckets: int = 16       # band-key partitions (dedup index)
    hot_salts: int = 4             # sub-parts for hot hosts (skew splitting)
    hot_threshold: int = 256       # admitted-rows/host above which we salt
    bloom_capacity: int = 1 << 20  # per-uh-bucket seen-filter sizing
    driver_path_max_rows: int = 2_000_000  # below this, politeness-budget-
    # bounded sets (admission survivors, generation links, frontier update)
    # finish on the driver — same results, no pipeline launch; 0 forces the
    # distributed branches everywhere (used by the parity tests)
    driver_path_max_bytes: int = 2 << 30  # the row bound alone is byte-blind
    # (2 M wide-caption rows can be multi-GB through one process — VERDICT r3
    # item 4): the page path also routes distributed when admitted rows ×
    # the PREVIOUS generation's average caption width exceeds this budget.
    # Gen 0 has no width estimate yet and falls back to the row bound.
    max_generations: int | None = None  # stop early (resume/crash tests)
    compact_seen_every: int = 50   # fold per-generation seen tables into one
    # every K generations (bounds the per-bucket fragment count the merge
    # anti-join has to read — SCALE.md debt #2)
    exact_url_confirm: bool = False  # SCALE.md "64-bit url_hash identity",
    # now configurable: confirm URL-STRING equality on hash-matched rows in
    # the frontier merge before dropping a candidate (bucket-local string
    # compares on collision candidates only; no extra shuffle). Off by
    # default — E[2.7 colliding pairs] at 10¹⁰ URLs is usually acceptable.
    band_key_cap: int | None = None  # OPT-IN flood guard (SCALE.md debt #3):
    # verify each new row against at most this many OLDEST rows of its band
    # run. Bounds adversarial caption floods (a crafted band key otherwise
    # grows its run O(corpus)); keep-oldest winners live at the front of the
    # run, so the truncation only risks missing dups of NEWER pages. Changes
    # dedup results when it triggers — leave None for reference parity.


@dataclass
class CrawlResult:
    root: str
    n_pages: int = 0
    n_generations: int = 0
    finished: bool = False
    metrics: list = field(default_factory=list)

    def pages_table(self) -> pa.Table:
        gens = _gens_of(self.root, "pages")
        t = pa.concat_tables([lt.read_pyarrow(_gd(self.root, "pages", g)) for g in gens])
        return t.sort_by("rank")

    def links_table(self) -> pa.Table:
        gens = _gens_of(self.root, "links")
        tabs = [lt.read_pyarrow(_gd(self.root, "links", g)) for g in gens]
        return pa.concat_tables(tabs) if tabs else pa.table({"from_rank": [], "to_url": []})

    def seen_urls(self) -> set:
        out: set = set()
        for g in _gens_of(self.root, "seen"):
            out.update(lt.read_pyarrow(_gd(self.root, "seen", g), columns=["url"])["url"].to_pylist())
        return out


# ---------------------------------------------------------------- ckpt util --


def _gd(root: str, name: str, gen: int) -> str:
    return os.path.join(root, name, f"gen{gen}")


def _gens_of(root: str, name: str) -> list[int]:
    base = os.path.join(root, name)
    if not os.path.isdir(base):
        return []
    return sorted(
        int(d[3:]) for d in os.listdir(base) if d.startswith("gen") and lt.exists(os.path.join(base, d))
    )


def _state_path(root: str) -> str:
    return os.path.join(root, "state.json")


def _load_state(root: str) -> dict | None:
    p = _state_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _save_state(root: str, st: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(st, f)
    os.replace(tmp, _state_path(root))


def _rollback(root: str, last_complete_gen: int) -> None:
    """Delete any generation directories newer than the committed state —
    a generation whose state.json update never landed never happened."""
    for name in ("frontier", "seen", "pages", "links", "bands", "sigs", "metrics", "blooms"):
        base = os.path.join(root, name)
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            if d.startswith("gen") and int(d[3:]) > last_complete_gen:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)


# ----------------------------------------------------------------- stages ----


def _frontier_row_table(cfg: CrawlConfig, urls, idxs, priorities, seqs) -> pa.Table:
    spec = cfg.params.spec
    idxs = np.asarray(idxs, dtype=np.int64)
    hosts = C.host_of_index(spec, idxs)
    uh = hash64(list(urls))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(uh, pa.uint64()),
            "idx": pa.array(idxs, pa.int64()),
            "host_id": pa.array(hosts, pa.int32()),
            "priority": pa.array(np.asarray(priorities, dtype=np.float64), pa.float64()),
            "seq": pa.array(np.asarray(seqs, dtype=np.int64), pa.int64()),
            "uh_bucket": pa.array((uh % np.uint64(cfg.num_uh_buckets)).astype(np.int32), pa.int32()),
        }
    )


def _bootstrap(cfg: CrawlConfig) -> dict:
    os.makedirs(cfg.root, exist_ok=True)
    seeds = list(cfg.params.seeds or default_seeds(cfg.params.spec))
    idxs = [C.index_of_url(u) for u in seeds]
    t = _frontier_row_table(cfg, seeds, idxs, [SEED_PRIORITY] * len(seeds), list(range(len(seeds))))
    lt.write_table(t, _gd(cfg.root, "frontier", 0), partition_col="uh_bucket")
    os.makedirs(os.path.join(cfg.root, "blooms", "gen0"), exist_ok=True)
    for b in range(cfg.num_uh_buckets):
        with open(os.path.join(cfg.root, "blooms", "gen0", f"bloom-{b}.bin"), "wb") as f:
            f.write(make_seen_filter(cfg.bloom_capacity).to_bytes())
    st = {"gen": 0, "rank": 0, "finished": False, "bloom_gen": [0] * cfg.num_uh_buckets}
    _save_state(cfg.root, st)
    return st


def _bloom_gens_fallback(cfg: CrawlConfig, upto_gen: int) -> list[int]:
    """Reconstruct the per-bucket latest-bloom-generation map from disk
    (legacy checkpoints, or a state rewound past what its map references).
    Blooms are DERIVED state: any bucket whose file can't be found is rebuilt
    from the authoritative seen table (the bloom must be a superset of the
    bucket's seen hashes, or re-discovered URLs would skip the exact
    anti-join and be re-admitted)."""
    out = [-1] * cfg.num_uh_buckets
    base = os.path.join(cfg.root, "blooms")
    gens = sorted(
        int(d[3:]) for d in os.listdir(base) if d.startswith("gen") and int(d[3:]) <= upto_gen
    )
    for g in gens:
        for b in range(cfg.num_uh_buckets):
            if os.path.exists(os.path.join(base, f"gen{g}", f"bloom-{b}.bin")):
                out[b] = g
    missing = [b for b in range(cfg.num_uh_buckets) if out[b] < 0]
    if missing:
        seen_gens = [g for g in _gens_of(cfg.root, "seen") if g <= upto_gen]
        os.makedirs(os.path.join(base, f"gen{upto_gen}"), exist_ok=True)
        for b in missing:
            bloom = make_seen_filter(cfg.bloom_capacity)
            for g in seen_gens:
                try:
                    t = lt.read_pyarrow(
                        _gd(cfg.root, "seen", g), columns=["url_hash"], partitions=[b]
                    )
                    bloom.add_many(t["url_hash"].to_numpy().astype(np.uint64))
                except FileNotFoundError:
                    pass
            with open(os.path.join(base, f"gen{upto_gen}", f"bloom-{b}.bin"), "wb") as f:
                f.write(bloom.to_bytes())
            out[b] = upto_gen
    return out


# per-worker-process cache of pruned corpus partition lookups
_PART_CACHE: dict = {}


def _corpus_lookup(corpus_path: str, base_part: int):
    key = (corpus_path, base_part)
    hit = _PART_CACHE.get(key)
    if hit is None:
        t = lt.read_pyarrow(
            corpus_path, columns=["image_id", "caption", "phash"], partitions=[base_part]
        )
        idx = np.fromiter((int(s[3:]) for s in t["image_id"].to_pylist()), dtype=np.int64)
        order = np.argsort(idx)
        # sorted-index + argsort order → vectorized searchsorted lookups
        hit = (
            np.array(t["caption"].to_pylist(), dtype=object),
            t["phash"].to_numpy(),
            idx[order],
            order,
        )
        _PART_CACHE[key] = hit
    return hit


def _fetch_group(group: pa.Table, spec_dict: dict, salts: int, corpus_path: str, gen: int) -> pa.Table:
    """One host-affine (salted) partition of the admitted set → page rows.
    Stateful per-partition work: corpus partition load is cached per
    worker process; robots policies per host are derived once per group
    (ST4 host-affinity ⇒ hit rate ≈ 1, SURVEY §2.3). Module-level so it can
    run either inside a Ray Data ``groupby(part).map_groups`` stage or as a
    raw per-part Ray task (the budget-bounded fast path)."""
    spec = C.CorpusSpec(**spec_dict)
    base = int(group["part"][0].as_py()) // salts
    caps, phs, idx_sorted, order = _corpus_lookup(corpus_path, base)
    urls = group["url"].to_pylist()
    idxs = group["idx"].to_numpy()
    hosts = group["host_id"].to_numpy()
    paths_arr = np.array(paths_of(urls), dtype=str)
    n = len(urls)
    # robots check, vectorized per host prefix (M7)
    disallowed = np.zeros(n, dtype=bool)
    for h in np.unique(hosts):
        pol = C.robots_for_host(spec, int(h))
        if pol.disallow_prefixes:
            hm = hosts == h
            for pref in pol.disallow_prefixes:
                disallowed |= hm & np.char.startswith(paths_arr, pref)
    # M5: binary content-types short-circuit HTML processing — the page
    # is stored BINARY with its data-type code, no caption/links/dedup
    # (crawler.py:630-645); robots still wins (checked first, as the
    # reference checks is_crawlable before fetching)
    from ..functions.binary import binary_code

    data_type = np.full(n, "", dtype=object)
    if spec.binary_permille:
        cts = C.content_type_of_index(spec, idxs)
        codes = [binary_code(ct) for ct in cts]
        is_binary = ~disallowed & np.array([c is not None for c in codes])
        data_type[is_binary] = [c for c, m in zip(codes, is_binary) if m]
    else:
        is_binary = np.zeros(n, dtype=bool)
    # corpus lookup via searchsorted on the cached sorted index; a miss
    # is a fetch failure → error row, never an exception (SURVEY §4
    # retries row: failure rows routed to an errors output)
    if len(idx_sorted):
        ii_c = np.minimum(np.searchsorted(idx_sorted, idxs), len(idx_sorted) - 1)
        valid = idx_sorted[ii_c] == idxs
        p = order[ii_c]
    else:
        valid = np.zeros(n, dtype=bool)
        p = np.zeros(n, dtype=np.int64)
    fetched_m = ~disallowed & ~is_binary & valid
    status = np.full(n, "error", dtype=object)
    status[disallowed] = "disallowed"
    status[is_binary] = "binary"
    status[fetched_m] = "fetched"
    captions = np.full(n, "", dtype=object)
    captions[fetched_m] = caps[p[fetched_m]]
    phashes = np.zeros(n, dtype=np.int64)
    phashes[fetched_m] = phs[p[fetched_m]]
    return pa.table(
        {
            "rank": group["rank"],
            "gen": pa.array(np.full(n, gen, dtype=np.int32), pa.int32()),
            "url": group["url"],
            "idx": group["idx"],
            "host_id": group["host_id"],
            "priority": group["priority"],
            "seq": group["seq"],
            "status": pa.array(status, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "data_type": pa.array(data_type, pa.string()),
        }
    )


def _make_fetch_fn(cfg: CrawlConfig, corpus_path: str, gen: int):
    spec_dict = cfg.params.spec.__dict__.copy()
    salts = cfg.hot_salts

    def fetch_part(group: pa.Table) -> pa.Table:
        return _fetch_group(group, spec_dict, salts, corpus_path, gen)

    return fetch_part


_FETCH_REMOTE = None


def _fetch_remote():
    global _FETCH_REMOTE
    if _FETCH_REMOTE is None:
        import ray as _ray

        _FETCH_REMOTE = _ray.remote(num_cpus=1)(_fetch_group)
    return _FETCH_REMOTE


def _sig_batch(cfg: CrawlConfig):
    nbk = cfg.num_bk_buckets

    def fn(b: pa.Table) -> tuple:
        return _sig_table(b, nbk)

    return fn


_SIG_REMOTE = None


def _sig_table_slice(t: pa.Table, off: int, n: int, nbk: int) -> tuple:
    return _sig_table(t.slice(off, n), nbk)


def _sig_remote():
    """Module-level cached remote for the signature pass — defining a fresh
    ray.remote per generation re-exports the function to every worker each
    time (measured ~0.3-1 s/generation of pure overhead)."""
    global _SIG_REMOTE
    if _SIG_REMOTE is None:
        import ray as _ray

        _SIG_REMOTE = _ray.remote(num_cpus=1)(_sig_table_slice)
    return _SIG_REMOTE


def _sig_table(b: pa.Table, nbk: int) -> tuple:
    """Fetched pages → (lean band rows, (ranks, sig_matrix)).

    Two band families:
    * family 1 — 50 MinHash bands × 4 rows. Any pair with est-Jaccard
      ≥ 0.8 collides in ≥ 1 band (pigeonhole, semantics.MINHASH_BANDS);
      exact-equal captions have est-J = 1.0, so the reference's md5
      exact-dup check (M9/D3) is subsumed.
    * family 2 — 8 pHash bands × 8 bits. Any pair with Hamming ≤ 7
      collides in ≥ 1 band.

    Band rows are LEAN (~29 B each); the 200-perm signatures live once
    per page in a separate (rank, sig) side table, loaded (and cached
    per worker process — the fragments are immutable) only by the verify
    tasks that hit a family-1 candidate run."""
    mh = minhasher()
    caps = b["caption"].to_pylist()
    ranks = b["rank"].to_numpy()
    phs = b["phash"].to_numpy()
    sigs = mh.signatures([c.split() for c in caps]).astype(np.uint32)  # (n, 200)
    mh_keys = mh.band_keys(sigs.astype(np.uint64), bands=MINHASH_BANDS)
    ph_keys = phash_band_keys(phs, bands=PHASH_BANDS)
    n = len(ranks)
    key = np.concatenate([mh_keys.ravel(), ph_keys.ravel()])
    fam = np.concatenate(
        [np.full(n * MINHASH_BANDS, 1, dtype=np.int8), np.full(n * PHASH_BANDS, 2, dtype=np.int8)]
    )
    rank_col = np.concatenate([np.repeat(ranks, MINHASH_BANDS), np.repeat(ranks, PHASH_BANDS)])
    ph_col = np.concatenate([np.zeros(n * MINHASH_BANDS, dtype=np.int64), np.repeat(phs, PHASH_BANDS)])
    bands = pa.table(
        {
            "band_key": pa.array(key, pa.uint64()),
            "bk_bucket": pa.array((key % np.uint64(nbk)).astype(np.int32), pa.int32()),
            "rank": pa.array(rank_col, pa.int64()),
            "family": pa.array(fam, pa.int8()),
            "phash": pa.array(ph_col, pa.int64()),
        }
    )
    return bands, (ranks.astype(np.int64), sigs)


# per-worker caches of immutable dedup-index fragments
_BANDS_FRAG_CACHE: dict = {}
_SIGS_FRAG_CACHE: dict = {}


def _cached_bands(path: str) -> pa.Table:
    t = _BANDS_FRAG_CACHE.get(path)
    if t is None:
        import pyarrow.parquet as _pq

        t = _pq.read_table(path, columns=["band_key", "rank", "family", "phash"])
        _BANDS_FRAG_CACHE[path] = t
    return t


def _sig_fragment_matrix(path: str, cache: bool = True) -> tuple:
    """One sig fragment → (ranks int64, sig matrix uint32 (n, 200)), parsed
    once per worker process when cached (fragments are immutable). Staged
    per-generation temporaries pass cache=False."""
    hit = _SIGS_FRAG_CACHE.get(path) if cache else None
    if hit is None:
        import pyarrow.parquet as _pq

        t = _pq.read_table(path, columns=["rank", "sig"])
        blobs = t["sig"].to_pylist()
        mat = (
            np.frombuffer(b"".join(blobs), dtype=np.uint32).reshape(len(blobs), -1)
            if blobs
            else np.empty((0, 0), dtype=np.uint32)
        )
        hit = (t["rank"].to_numpy().astype(np.int64), mat)
        if cache:
            _SIGS_FRAG_CACHE[path] = hit
    return hit


def _cached_sigs(paths: tuple, cache: bool = True) -> tuple:
    """(sorted ranks, row-aligned sig matrix) merged over the given sig
    fragments. Callers pass only the fragments of ONE rank bucket (sigs are
    partitioned by rank % num_bk_buckets), so a verify task touches 1/B of
    the sig index per old-rank bucket it actually needs — SCALE.md debt #1
    closed. Matrix form so verify runs GATHER rows vectorized instead of one
    python dict lookup per candidate rank."""
    parts = [_sig_fragment_matrix(p, cache=cache) for p in paths]
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.uint32)
    ranks = np.concatenate([p[0] for p in parts])
    mat = np.vstack([p[1] for p in parts])
    order = np.argsort(ranks, kind="stable")
    return ranks[order], mat[order]


def _load_sig_bucket(paths: tuple) -> tuple:
    """Ray task: merge ONE rank-bucket's committed sig fragments into
    (sorted ranks int64, uint32 matrix, uint8 low-byte projection). The
    result lives in the OBJECT STORE, so every verify actor on the node
    reads it zero-copy — one parquet parse + one uint8 conversion per
    (bucket, fragment-set) per session, instead of one per ACTOR (which
    multiplied the side-table load with pool width and anti-scaled the
    verify wave)."""
    sr, sm = _cached_sigs(paths, cache=False)
    return sr, sm, (sm & 0xFF).astype(np.uint8)


_SIG_LOAD_REMOTE = None
_SIG_REF_CACHE: dict = {}


def _sig_load_remote():
    global _SIG_LOAD_REMOTE
    if _SIG_LOAD_REMOTE is None:
        import ray as _ray

        _SIG_LOAD_REMOTE = _ray.remote(num_cpus=0)(_load_sig_bucket)
    return _SIG_LOAD_REMOTE


def _sig_refs(sig_paths_by_sb: dict) -> dict:
    """Committed sig fragments → shared object-store matrices (see
    :func:`_load_sig_bucket`). Driver-side cache keyed by (job, bucket,
    fragment paths): unchanged buckets reuse their live object across
    generations; a commit/compaction that rewrites a bucket's fragments
    changes the key, the stale ref drops and plasma reclaims it."""
    import ray as _ray

    job = _ray.get_runtime_context().get_job_id()
    load = _sig_load_remote()
    out: dict = {}
    live: set = set()
    for sb, paths in sig_paths_by_sb.items():
        key = (job, int(sb), tuple(paths))
        live.add(key)
        ref = _SIG_REF_CACHE.get(key)
        if ref is None:
            ref = _SIG_REF_CACHE[key] = load.remote(tuple(paths))
        out[int(sb)] = ref
    for k in [
        k for k in _SIG_REF_CACHE if k[0] != job or (k[1] in out and k not in live)
    ]:
        _SIG_REF_CACHE.pop(k)
    return out


def _make_sigs_of(
    new_ranks_sorted: np.ndarray,
    new_mat: np.ndarray,
    new_sig_paths_by_sb: dict,
    old_sig_refs_by_sb: dict,
    n_sb: int,
    staged: bool,
):
    """Vectorized signature resolver for one verify task: ranks → (n, 200)
    uint32 matrix in one gather. New ranks resolve from the generation's
    broadcast matrix (driver path) or the staged fragments (distributed
    path, lazily per rank-bucket, uncached — per-gen temporaries); old ranks
    zero-copy from the object-store matrices shared across the pool."""
    old_cache: dict = {}
    staged_cache: dict = {}
    low_cache: dict = {}  # per-task uint8 projections of staged/new matrices

    def old_of(sb: int):
        hit = old_cache.get(sb)
        if hit is None:
            ref = old_sig_refs_by_sb.get(sb)
            if ref is None:
                hit = (np.empty(0, np.int64), np.empty((0, 0), np.uint32), None)
            else:
                import ray as _ray

                hit = _ray.get(ref)  # zero-copy plasma read
            old_cache[sb] = hit
        return hit

    def staged_of(sb: int):
        hit = staged_cache.get(sb)
        if hit is None:
            hit = _cached_sigs(tuple(new_sig_paths_by_sb.get(sb, ())), cache=False) + (None,)
            staged_cache[sb] = hit
        return hit

    def low_of(sm: np.ndarray) -> np.ndarray:
        """uint8 low-byte copy for matrices that arrive without one (the
        generation's own rows + staged temporaries) — once per task."""
        hit = low_cache.get(id(sm))
        if hit is None:
            hit = low_cache[id(sm)] = (sm & 0xFF).astype(np.uint8)
        return hit

    def sigs_of(ranks: np.ndarray, low: bool = False) -> np.ndarray:
        """ranks → row-aligned sig matrix. ``low=True`` gathers from the
        uint8 low-byte projections instead (1/4 the memory traffic; byte
        equality upper-bounds word equality, see _verify_bucket)."""
        n = len(ranks)
        ranks = ranks.astype(np.int64)
        out = None
        dt = np.uint8 if low else new_mat.dtype
        if len(new_ranks_sorted):
            nm = low_of(new_mat) if low else new_mat
            p = np.minimum(np.searchsorted(new_ranks_sorted, ranks), len(new_ranks_sorted) - 1)
            got = new_ranks_sorted[p] == ranks
            if got.any():
                out = np.empty((n, nm.shape[1]), dtype=dt)
                out[got] = nm[p[got]]
        else:
            got = np.zeros(n, dtype=bool)
        rem_idx = np.flatnonzero(~got)
        if len(rem_idx):
            rr = ranks[rem_idx]
            rr_sb = rr % n_sb
            for sb in np.unique(rr_sb):
                m = rr_sb == sb
                sel, tgt = rr[m], rem_idx[m]
                filled = np.zeros(len(sel), dtype=bool)
                sources = (staged_of(int(sb)),) if staged else ()
                sources = sources + (old_of(int(sb)),)
                for sr, sm, sm8 in sources:
                    if not len(sr):
                        continue
                    if low:
                        sm = sm8 if sm8 is not None else low_of(sm)
                    q = np.minimum(np.searchsorted(sr, sel), len(sr) - 1)
                    hit = (sr[q] == sel) & ~filled
                    if hit.any():
                        if out is None:
                            out = np.empty((n, sm.shape[1]), dtype=sm.dtype)
                        out[tgt[hit]] = sm[q[hit]]
                        filled |= hit
                if not filled.all():
                    raise KeyError(f"missing sigs for ranks {sel[~filled][:5].tolist()}")
        return out

    return sigs_of


_EMPTY_EDGES = pa.table({"rank_a": pa.array([], pa.int64()), "rank_b": pa.array([], pa.int64())})


_VERIFY_SIG_PREFIX = 50     # prefix dims for the exact pigeonhole pre-filter
# pair-compare chunk — sized so chunk×prefix×3 buffers stay cache-resident
# even with a full-width actor wave sharing one L3: 2^12 × 50 B × 3 bufs
# ≈ 600 KB/actor (×16 actors ≈ 9.6 MB aggregate, L3-resident) measured
# 5-17 % faster than 2^14 (≈ 2.4 MB/actor, 38 MB aggregate — thrashes the
# shared L3) at BOTH pool widths on the 40 k-page bench. Env-tunable.
_VERIFY_PAIR_CHUNK = 1 << int(os.environ.get("IEPS_VERIFY_CHUNK_LOG2", "12"))
_VERIFY_BUFS: dict = {}     # P → persistent per-actor compare buffers


def _bufs(P: int):
    """Reused chunk buffers for the pair-compare loop. Fancy-index
    materialization (`S8[ci, :P]`) allocates ~100 MB of fresh pages per
    bucket call; with 16+ verify actors concurrent the page-fault storms
    serialize on the VM memory subsystem and dominated the wave (measured
    8× on the kernel even single-threaded). np.take/np.equal into
    preallocated buffers makes the steady state allocation-free."""
    hit = _VERIFY_BUFS.get(P)
    if hit is None:
        ch = _VERIFY_PAIR_CHUNK
        hit = _VERIFY_BUFS[P] = (
            np.empty((ch, P), np.uint8),
            np.empty((ch, P), np.uint8),
            np.empty((ch, P), bool),
        )
    return hit


def _verify_bucket(
    group: pa.Table,
    sigs_of,
    band_key_cap: int | None = None,
    slice_mod: tuple[int, int] | None = None,
) -> pa.Table:
    """One band-key BUCKET (all rows whose band_key hashes there, old ∪ new)
    → verified similarity edges (old_rank < new_rank).

    Fully vectorized across ALL key-runs at once: one lexsort by
    (family, band_key, rank), then a global pair list (each NEW row × its
    within-run rank predecessors) built with segment arithmetic — no Python
    loop over runs (the bucket holds tens of thousands of tiny runs per
    generation; per-run numpy dispatch overhead dominated dedup_verify).
    The exact family predicate runs only on banded candidates (D2, SURVEY
    §2.7). MinHash pairs go through an exact two-stage pigeonhole prune: a
    pair whose first P of H signature dims match fewer than ``T·H − (H−P)``
    times can never reach mean ≥ T, so only survivors (real dups + rare
    near-threshold randoms) pay the full-width compare — ~4× less memory
    traffic with zero false negatives. ``sigs_of(ranks)`` resolves family-1
    signatures in one matrix gather per bucket."""
    n = group.num_rows
    if n < 2:
        return _EMPTY_EDGES
    fam = group["family"].to_numpy()
    key = group["band_key"].to_numpy()
    ranks = group["rank"].to_numpy()
    is_new = group["is_new"].to_numpy()
    if not is_new.any():
        return _EMPTY_EDGES
    order = np.lexsort((ranks, key, fam))  # run-segmented, rank-sorted within
    fam, key, ranks, is_new = fam[order], key[order], ranks[order], is_new[order]
    phs = group["phash"].to_numpy()[order]

    new_run = np.concatenate(([True], (key[1:] != key[:-1]) | (fam[1:] != fam[:-1])))
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    has_new = np.bincount(run_id, weights=is_new.astype(np.float64)) > 0
    good = (run_len >= 2) & has_new
    keep = good[run_id]
    if band_key_cap is not None:
        starts_all = np.concatenate(([0], np.cumsum(run_len)))[:-1]
        pos_all = np.arange(n) - starts_all[run_id]
        # flood guard: compare only against the OLDEST cap rows (plus every
        # new row so the generation's own pairs stay covered)
        keep &= (pos_all < band_key_cap) | is_new
    idx = np.flatnonzero(keep)
    if len(idx) < 2:
        return _EMPTY_EDGES
    fam, ranks, is_new, phs, run_id = fam[idx], ranks[idx], is_new[idx], phs[idx], run_id[idx]
    n2 = len(idx)

    seg_first = np.concatenate(([True], run_id[1:] != run_id[:-1]))
    seg_starts = np.flatnonzero(seg_first)
    seg_of_row = np.cumsum(seg_first) - 1
    pos = np.arange(n2) - seg_starts[seg_of_row]
    new_rows = np.flatnonzero(is_new & (pos > 0))
    if slice_mod is not None:
        # pair ownership is keyed by the NEW row (each new row pairs with its
        # run predecessors), so striding the new rows partitions the bucket's
        # pair list EXACTLY across S subtasks — the skew fix for heavy
        # band-key floods: one hot bucket's O(run²) compare no longer
        # serializes the verify wave on a wide pool (see _verify_subtasks)
        t, S = slice_mod
        new_rows = new_rows[t::S]
    cnt = pos[new_rows]  # each new row pairs with its run predecessors
    total = int(cnt.sum())
    if total == 0:
        return _EMPTY_EDGES
    i_idx = np.repeat(new_rows, cnt)
    offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    j_idx = (
        np.arange(total)
        - np.repeat(offs, cnt)
        + np.repeat(seg_starts[seg_of_row[new_rows]], cnt)
    )
    valid = ranks[j_idx] != ranks[i_idx]  # same page in two bands of one run
    i_idx, j_idx = i_idx[valid], j_idx[valid]
    # DEDUP candidate pairs across bands: a true near-dup pair co-occurs in
    # many band runs of the same bucket (≈ J⁴·n_bands for MinHash, ≥2 of 8
    # pHash bands), so the raw pair list verifies each real pair ~dozens of
    # times. One lexsort keeps a single instance per (family, rank, rank) —
    # the rows carry identical signatures in every band, so dropping the
    # copies cannot change any verdict.
    famp, rap, rbp = fam[i_idx], ranks[i_idx], ranks[j_idx]
    o = np.lexsort((rbp, rap, famp))
    i_idx, j_idx = i_idx[o], j_idx[o]
    rap, rbp, famp = rap[o], rbp[o], famp[o]
    first = np.concatenate(
        ([True], (rap[1:] != rap[:-1]) | (rbp[1:] != rbp[:-1]) | (famp[1:] != famp[:-1]))
    )
    i_idx, j_idx = i_idx[first], j_idx[first]

    ra: list = []
    rb: list = []
    fam1 = fam[i_idx] == 1
    if fam1.any():
        pi, pj = i_idx[fam1], j_idx[fam1]
        used = np.unique(np.concatenate([pi, pj]))
        # low-byte projection: byte equality is a SUPERSET of word equality,
        # so byte-match counts upper-bound true match counts — the uint8
        # stages below are exact prunes (zero false negatives) at 1/4 the
        # memory traffic. The verify wave runs pool-wide concurrently and is
        # BANDWIDTH-bound on this box, so bytes-per-pair IS the wall time;
        # full uint32 sigs are gathered only for the stage-2 survivors
        # (almost exclusively genuine duplicates).
        S8 = sigs_of(ranks[used], low=True)
        inv = np.empty(n2, dtype=np.int64)
        inv[used] = np.arange(len(used))
        si, sj = inv[pi], inv[pj]
        H = S8.shape[1]
        P = min(_VERIFY_SIG_PREFIX, H)
        S8p = np.ascontiguousarray(S8[:, :P])  # whole-row np.take target
        A, B, E = _bufs(P)
        need = MINHASH_THRESHOLD * H
        s3i: list = []
        s3j: list = []
        for c0 in range(0, len(si), _VERIFY_PAIR_CHUNK):
            ci, cj = si[c0 : c0 + _VERIFY_PAIR_CHUNK], sj[c0 : c0 + _VERIFY_PAIR_CHUNK]
            k = len(ci)
            # stage 1: uint8 prefix — pigeonhole: a pair under need-(H-P)
            # prefix matches can never reach `need` over all H dims
            np.take(S8p, ci, axis=0, out=A[:k])
            np.take(S8p, cj, axis=0, out=B[:k])
            np.equal(A[:k], B[:k], out=E[:k])
            pm8 = E[:k].sum(axis=1)
            c1 = np.flatnonzero(pm8 >= need - (H - P))
            if not len(c1):
                continue
            # stage 2: uint8 full width on prefix survivors
            m8f = pm8[c1] + (S8[ci[c1], P:] == S8[cj[c1], P:]).sum(axis=1)
            c2 = c1[m8f >= need]
            if len(c2):
                s3i.append(pi[c0 + c2])
                s3j.append(pj[c0 + c2])
        if s3i:
            # stage 3: exact uint32 confirm of the surviving pairs only
            qi, qj = np.concatenate(s3i), np.concatenate(s3j)
            rows = np.unique(np.concatenate([qi, qj]))
            Sx = sigs_of(ranks[rows])
            inv3 = np.empty(n2, dtype=np.int64)
            inv3[rows] = np.arange(len(rows))
            mt = (Sx[inv3[qi]] == Sx[inv3[qj]]).sum(axis=1)
            ok = (mt / H) >= MINHASH_THRESHOLD
            if ok.any():
                ra.extend(ranks[qj[ok]].tolist())
                rb.extend(ranks[qi[ok]].tolist())
    fam2 = ~fam1
    if fam2.any():
        pi, pj = i_idx[fam2], j_idx[fam2]
        ok = hamming64(phs[pi].astype(np.uint64), phs[pj].astype(np.uint64)) <= PHASH_HAM_MAX
        if ok.any():
            ra.extend(ranks[pj[ok]].tolist())
            rb.extend(ranks[pi[ok]].tolist())
    return pa.table({"rank_a": pa.array(ra, pa.int64()), "rank_b": pa.array(rb, pa.int64())})


def _verify_one_bucket(
    new_lean: pa.Table, new_ranks: np.ndarray, new_sigs: np.ndarray,
    bucket: int, old_paths: list, sig_refs_by_sb: dict, n_sb: int,
    band_key_cap: int | None = None,
    slice_mod: tuple[int, int] | None = None,
) -> pa.Table:
    """One bucket → verified edges: lean old band rows from pruned fragments
    (cached per worker — immutable), broadcast lean new rows + sig matrix,
    old sigs zero-copy from the pool-shared object-store side table
    (:func:`_sig_refs`). Raw Ray task: the fan-out is a bounded set of
    pre-partitioned units (≤ num_bk_buckets), which a task pool expresses
    with far less overhead than a Dataset pipeline — the documented
    carve-out for per-partition state."""
    bb = new_lean["bk_bucket"].to_numpy()
    mask = bb == bucket
    sub = new_lean.filter(pa.array(mask)).drop_columns(["bk_bucket"])
    sub = sub.append_column("is_new", pa.array(np.ones(sub.num_rows, dtype=bool)))
    if old_paths:
        old = pa.concat_tables([_cached_bands(p) for p in old_paths])
        old = old.append_column("is_new", pa.array(np.zeros(old.num_rows, dtype=bool)))
        sub = pa.concat_tables([old, sub.select(old.column_names)])
    new_order = np.argsort(new_ranks, kind="stable")
    new_sorted = new_ranks[new_order]
    sigs_of = _make_sigs_of(
        new_sorted, new_sigs[new_order], {}, sig_refs_by_sb, n_sb, staged=False
    )
    t0 = time.perf_counter()
    out = _verify_bucket(sub, sigs_of, band_key_cap, slice_mod)
    return out.replace_schema_metadata(
        {b"secs": b"%.4f" % (time.perf_counter() - t0), b"bucket": b"%d" % bucket}
    )


_VERIFY_POOL: dict = {}


def _verify_pool(n: int) -> list:
    """Verify ACTOR pool with bucket→actor affinity (bucket % n): raw tasks
    land on arbitrary workers, so the immutable-fragment caches kept missing
    and every generation re-paid cold parquet reads of the banded index
    (~0.3 s/bucket measured vs 0.01 s warm). Routing bucket b to actor
    b % n makes each fragment load once EVER per crawl. num_cpus=0: the
    verify wave is a short burst once per generation — a standing num_cpus=1
    reservation per actor would starve the pipeline stages between waves."""
    import ray as _ray

    # key by job id: a ray.shutdown()+init() in the same process must not
    # resurrect handles to the previous session's (dead) actors
    key = (n, _ray.get_runtime_context().get_job_id())
    pool = _VERIFY_POOL.get(key)
    if pool is None:

        @_ray.remote(num_cpus=0)
        class VerifyActor:
            def ping(self) -> int:  # process/import warm-up probe
                return 1

            def verify(self, *a) -> pa.Table:
                return _verify_one_bucket(*a)

            def verify_staged(self, *a) -> pa.Table:
                return _verify_one_bucket_staged(*a)

        pool = [VerifyActor.remote() for _ in range(n)]
        for k in [k for k in _VERIFY_POOL if k[1] != key[1]]:
            _VERIFY_POOL.pop(k)  # drop stale-session handles
        _VERIFY_POOL[key] = pool
    return pool


def warm_verify_pool(num_bk_buckets: int) -> None:
    """Start the verify actor processes ahead of the first generation (the
    pool otherwise pays ~n process spawns + imports inside gen 1)."""
    import ray as _ray

    _ray.get([a.ping.remote() for a in _verify_pool(_pool_size(num_bk_buckets))])


def _pool_size(num_buckets: int) -> int:
    """Verify-pool width = the RAY SESSION's CPU budget, not the host's
    os.cpu_count(): the actors are num_cpus=0 (see _verify_pool), so sizing
    by the host would silently run a 4-cpu session's verify wave 32-wide —
    over-subscribing the node and invalidating any N-vs-4N scaling read.
    ``IEPS_VERIFY_POOL_CAP`` additionally bounds the width: the compare
    kernel is DRAM-bandwidth-bound (see _verify_bucket), so on a single
    node the wave stops scaling at the memory-system saturation point —
    on a multi-node cluster the cap is per node, where each node brings
    its own memory system and the wave scales with nodes again."""
    import ray as _ray

    try:
        budget = int(_ray.cluster_resources().get("CPU", 0)) or (os.cpu_count() or 8)
    except Exception:
        budget = os.cpu_count() or 8
    cap = int(os.environ.get("IEPS_VERIFY_POOL_CAP", "0")) or num_buckets
    return max(1, min(num_buckets, budget, cap))


def _verify_subtasks(
    counts: dict[int, int], pool_n: int, secs: dict[int, float] | None = None
) -> dict[int, int]:
    """Per-bucket subtask counts for the verify wave — SKEW-AWARE. A single
    hot band-key bucket (caption flood — observed: one 2 040-row run ⇒ 2 M
    pairs) serializes the wave at max(bucket) on a wide pool, so oversized
    buckets split: striding the bucket's new rows (``slice_mod`` in
    :func:`_verify_bucket`) partitions its pair list EXACTLY across S
    subtasks. But splitting is not free — every subtask re-pays the bucket's
    full fixed preprocessing (old-band concat + lexsort + run scan), so a
    bucket is split only when its share of the wave exceeds one pool slot.
    The earlier BLANKET S for all buckets multiplied the wave's total CPU by
    ~S for nothing on uniform buckets (measured at 16 cpus / 32 uniform
    buckets: S=2 ⇒ 2.4× verify CPU incl. the DRAM contention it induces —
    the single worst scaling term of the crawl).

    Two signals, max-combined: the NEW-ROW count (available before the wave;
    catches this-generation floods) and the MEASURED per-bucket seconds of
    the previous generation's wave (``secs`` — bucket cost is dominated by
    its band-key run structure, which is stable across generations, and the
    count proxy misses it: observed a 2.7×-mean straggler bucket at uniform
    counts). Seconds enter as relative shares (cost_b / total_cost · pool),
    so the signal is invariant to generation size. Env override
    ``IEPS_VERIFY_SPLIT`` forces a uniform S."""
    env = int(os.environ.get("IEPS_VERIFY_SPLIT", "0"))
    if env:
        return {b: env for b in counts}
    total = sum(counts.values())
    if total <= 0 or pool_n <= 1:
        return {b: 1 for b in counts}
    share = max(1.0, total / pool_n)  # fair share of new rows per wave slot
    out = {b: max(1, min(8, int(-(-c // share)))) for b, c in counts.items()}
    if secs:
        tw = sum(secs.get(b, 0.0) for b in counts)
        if tw > 0:
            share_w = tw / pool_n
            for b in counts:
                sw = secs.get(b)
                if sw and sw > share_w:
                    out[b] = max(out[b], min(8, int(-(-sw // share_w))))
    return out


_VERIFY_WAVE: dict = {}
# measured per-bucket seconds of the LAST verify wave — feeds the next
# generation's _verify_subtasks as the cost signal (reset per crawl)
_LAST_BUCKET_SECS: dict[int, float] = {}


def _collect_verify(parts: list) -> pa.Table:
    """Concat verify-task results, recording the wave's per-task timing
    skew (max vs sum) into the generation's stage_secs for auditability
    and the per-bucket cost totals for the next wave's split decision."""
    secs = []
    by_bucket: dict[int, float] = {}
    for p in parts:
        md = p.schema.metadata
        if md and b"secs" in md:
            s = float(md[b"secs"])
            secs.append(s)
            if b"bucket" in md:
                bk = int(md[b"bucket"])
                by_bucket[bk] = by_bucket.get(bk, 0.0) + s
    if secs:
        _VERIFY_WAVE["verify_task_max"] = round(max(secs), 3)
        _VERIFY_WAVE["verify_task_sum"] = round(sum(secs), 3)
        _VERIFY_WAVE["verify_n_tasks"] = len(secs)
    if by_bucket:
        _LAST_BUCKET_SECS.clear()
        _LAST_BUCKET_SECS.update(by_bucket)
    return pa.concat_tables(parts)


def _resolve_dups(edges: pd.DataFrame, new_ranks: np.ndarray) -> dict[int, int]:
    """Sequential winner resolution (keep-oldest, duplicates never become
    winners — database.py:416-436). Edge count is dup-rate bounded, so this
    driver step is O(edges), not O(pages)."""
    dup_of: dict[int, int] = {}
    if edges.empty:
        return dup_of
    by_new: dict[int, list[int]] = {}
    for a, b in zip(edges["rank_a"].to_numpy(), edges["rank_b"].to_numpy()):
        by_new.setdefault(int(b), []).append(int(a))
    for rb in np.sort(new_ranks):
        partners = [ra for ra in by_new.get(int(rb), []) if ra not in dup_of]
        if partners:
            dup_of[int(rb)] = min(partners)
    return dup_of


def _verify_one_bucket_staged(
    bucket: int,
    new_paths: list,
    old_paths: list,
    new_sig_paths_by_sb: dict,
    sig_refs_by_sb: dict,
    n_sb: int,
    band_key_cap: int | None = None,
    slice_mod: tuple[int, int] | None = None,
) -> pa.Table:
    """Distributed-branch variant of :func:`_verify_one_bucket`: the
    generation's NEW lean band rows and signatures are never driver-
    materialized or broadcast — the sig pass wrote them straight to staged
    fragments (partitioned by bk_bucket / rank-bucket), and each verify task
    reads only its own bucket's staged fragments plus the pruned committed
    index. Staged files are per-generation temporaries, so they bypass the
    immutable-fragment worker caches (caching them would leak memory across
    generations)."""
    import pyarrow.parquet as _pq

    cols = ["band_key", "rank", "family", "phash"]
    sub = pa.concat_tables([_pq.read_table(p, columns=cols) for p in new_paths])
    sub = sub.append_column("is_new", pa.array(np.ones(sub.num_rows, dtype=bool)))
    if old_paths:
        old = pa.concat_tables([_cached_bands(p) for p in old_paths])
        old = old.append_column("is_new", pa.array(np.zeros(old.num_rows, dtype=bool)))
        sub = pa.concat_tables([old, sub.select(old.column_names)])
    sigs_of = _make_sigs_of(
        np.empty(0, dtype=np.int64),
        np.empty((0, 0), dtype=np.uint32),
        new_sig_paths_by_sb,
        sig_refs_by_sb,
        n_sb,
        staged=True,
    )
    t0 = time.perf_counter()
    out = _verify_bucket(sub, sigs_of, band_key_cap, slice_mod)
    return out.replace_schema_metadata(
        {b"secs": b"%.4f" % (time.perf_counter() - t0), b"bucket": b"%d" % bucket}
    )


def _filter_ranks_task(
    partition: int, paths: list, tmp_dir: str, drop_ranks: np.ndarray
) -> dict | None:
    """Rewrite one staged partition dropping the given ranks (duplicates
    never enter the committed dedup index — database.py:416-436). The drop
    set is dup-rate bounded, so it ships whole with the task."""
    import uuid as _uuid

    import pyarrow.parquet as _pq

    t = pa.concat_tables([_pq.read_table(p) for p in paths])
    keep = ~np.isin(t["rank"].to_numpy(), drop_ranks)
    t = t.filter(pa.array(keep))
    if t.num_rows == 0:
        return None
    frag = f"part={partition}/frag-{_uuid.uuid4().hex[:8]}.parquet"
    os.makedirs(os.path.join(tmp_dir, f"part={partition}"), exist_ok=True)
    _pq.write_table(t, os.path.join(tmp_dir, frag))
    return {"path": frag, "num_rows": t.num_rows, "partition": partition}


_FILTER_RANKS_REMOTE = None


def _filter_ranks_remote():
    global _FILTER_RANKS_REMOTE
    if _FILTER_RANKS_REMOTE is None:
        import ray as _ray

        _FILTER_RANKS_REMOTE = _ray.remote(num_cpus=1)(_filter_ranks_task)
    return _FILTER_RANKS_REMOTE


_EMPTY_META = pa.table(
    {
        "kind": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "num_rows": pa.array([], pa.int64()),
        "partition": pa.array([], pa.int32()),
    }
)


def _make_sig_writer(nbk: int, btmp: str, stmp: str):
    """map_batches stage: html rows of a fetched batch → lean band + sig
    fragments written DIRECTLY to the staging dirs (partitioned by
    bk_bucket / rank-bucket); only fragment METADATA flows back through the
    pipeline. This is what keeps the per-generation page path streaming —
    the 200-perm signatures (×800 B/page) never transit the driver."""
    import uuid as _uuid

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    def sig_write(b: pa.Table) -> pa.Table:
        hb = b.filter(_pc.equal(b["status"], "fetched"))
        if hb.num_rows == 0:
            return _EMPTY_META
        bands, (ranks, sigs) = _sig_table(hb, nbk)
        kinds, paths, nrows, parts = [], [], [], []
        bb = bands["bk_bucket"].to_numpy()
        for k in np.unique(bb):
            sub = bands.filter(pa.array(bb == k))
            frag = f"part={k}/frag-{_uuid.uuid4().hex[:8]}.parquet"
            os.makedirs(os.path.join(btmp, f"part={k}"), exist_ok=True)
            _pq.write_table(sub, os.path.join(btmp, frag))
            kinds.append("bands"); paths.append(frag)
            nrows.append(sub.num_rows); parts.append(int(k))
        sb = (ranks % nbk).astype(np.int32)
        sig_t = pa.table(
            {
                "rank": pa.array(ranks, pa.int64()),
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                "sb": pa.array(sb, pa.int32()),
            }
        )
        for k in np.unique(sb):
            sub = sig_t.filter(pa.array(sb == k))
            frag = f"part={k}/frag-{_uuid.uuid4().hex[:8]}.parquet"
            os.makedirs(os.path.join(stmp, f"part={k}"), exist_ok=True)
            _pq.write_table(sub, os.path.join(stmp, frag))
            kinds.append("sigs"); paths.append(frag)
            nrows.append(sub.num_rows); parts.append(int(k))
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "path": pa.array(paths, pa.string()),
                "num_rows": pa.array(nrows, pa.int64()),
                "partition": pa.array(parts, pa.int32()),
            }
        )

    return sig_write


def _old_index_paths(cfg: CrawlConfig, buckets: list[int]) -> tuple[dict, dict]:
    """(band fragment paths per bk_bucket, sig fragment paths per rank-bucket)
    of the COMMITTED dedup index, partition-pruned to the given buckets."""
    paths_by_bucket: dict[int, list[str]] = {b: [] for b in buckets}
    for g in _gens_of(cfg.root, "bands"):
        p = _gd(cfg.root, "bands", g)
        for b in buckets:
            try:
                paths_by_bucket[b].extend(lt.fragment_paths(p, partitions=[b]))
            except FileNotFoundError:
                pass
    sig_paths_by_sb: dict[int, list[str]] = {}
    for g in _gens_of(cfg.root, "sigs"):
        man = lt.read_manifest(_gd(cfg.root, "sigs", g))
        for fr in man["fragments"]:
            sb = fr.get("partition")
            if sb is not None:
                sig_paths_by_sb.setdefault(int(sb), []).append(
                    os.path.join(_gd(cfg.root, "sigs", g), fr["path"])
                )
    return paths_by_bucket, sig_paths_by_sb


def _generation_driver(cfg: CrawlConfig, corpus_path: str, gen: int, adm_t: pa.Table, mark):
    """Budget-bounded fast path of one generation's page pipeline: the
    admitted set fits `driver_path_max_rows`, so fetch runs as one raw task
    per part (skipping the Ray Data groupby-shuffle launch, ~0.3-0.5 s/gen of
    fixed cost), dedup broadcasts the generation's lean band rows + sig
    matrix via ray.put, and pages write from a driver table. Same results as
    :func:`_generation_distributed` (both parity-gated).

    → (status counts for metrics, (rank, idx) table of non-dup html pages)."""
    import ray as _ray

    parts_np = adm_t["part"].to_numpy()
    ft = _fetch_remote()
    spec_dict_f = cfg.params.spec.__dict__.copy()
    futs = [
        ft.remote(
            adm_t.filter(pa.array(parts_np == p)),
            spec_dict_f, cfg.hot_salts, corpus_path, gen,
        )
        for p in np.unique(parts_np)
    ]
    fetched = pa.concat_tables(_ray.get(futs)).to_pandas()
    fetched = fetched.sort_values("rank", kind="stable").reset_index(drop=True)
    html = fetched[fetched["status"] == "fetched"]
    mark("fetch")

    # ---- dedup: per-bucket banded verify — NO shuffle. The lean bands
    # index is disk-partitioned by bk_bucket and worker-cached (immutable
    # fragments); the generation's new lean band rows + one sig per page
    # (budget-bounded) broadcast via ray.put; one raw Ray task per bucket.
    dup_of: dict[int, int] = {}
    bands_new_t = None
    if len(html):
        sig_fn = _sig_batch(cfg)
        html_t = pa.Table.from_pandas(html, preserve_index=False)
        if len(html) <= 512:
            bands_new_t, (new_ranks, new_sigs) = sig_fn(html_t)
        else:
            # distribute the MinHash signature pass (200 perms/caption —
            # the driver-side version was the crawl's worst scaling term).
            # The table ships via ONE ray.put; tasks slice worker-side
            # (shipping a slice per task re-serializes its buffers).
            sig_task = _sig_remote()
            tref = _ray.put(html_t)
            futs = [
                sig_task.remote(tref, o, 512, cfg.num_bk_buckets)
                for o in range(0, len(html), 512)
            ]
            parts = _ray.get(futs)
            bands_new_t = pa.concat_tables([p[0] for p in parts])
            new_ranks = np.concatenate([p[1][0] for p in parts])
            new_sigs = np.vstack([p[1][1] for p in parts])
        mark("dedup_sig")
        buckets = sorted(set(bands_new_t["bk_bucket"].to_numpy().tolist()))
        paths_by_bucket, sig_paths_by_sb = _old_index_paths(cfg, buckets)
        sig_refs_by_sb = _sig_refs(sig_paths_by_sb)
        mark("dedup_paths")
        lean_ref = _ray.put(bands_new_t)
        ranks_ref = _ray.put(new_ranks)
        sigs_ref = _ray.put(new_sigs)
        mark("dedup_put")
        pool = _verify_pool(_pool_size(cfg.num_bk_buckets))
        _ub, _uc = np.unique(bands_new_t["bk_bucket"].to_numpy(), return_counts=True)
        Sb = _verify_subtasks(
            dict(zip(_ub.tolist(), _uc.tolist())), len(pool), secs=dict(_LAST_BUCKET_SECS)
        )
        futs = [
            # t == 0 stays on b % n (fragment-cache affinity); extra subtasks
            # of a hot bucket spread across the pool
            pool[(b + t * 17) % len(pool)].verify.remote(
                lean_ref, ranks_ref, sigs_ref, b, paths_by_bucket[b],
                sig_refs_by_sb, cfg.num_bk_buckets, cfg.band_key_cap,
                (t, Sb[b]) if Sb[b] > 1 else None,
            )
            for b in buckets
            for t in range(Sb.get(b, 1))
        ]
        edges = _collect_verify(_ray.get(futs)).to_pandas().drop_duplicates()
        mark("dedup_verify")
        dup_of = _resolve_dups(edges, html["rank"].to_numpy())
    mark("dedup")

    # ---- classify + write pages
    status = fetched["status"].to_numpy().copy()
    dup_col = np.full(len(fetched), -1, dtype=np.int64)
    ranks = fetched["rank"].to_numpy()
    is_fetched = status == "fetched"
    if dup_of:
        dup_ranks = np.fromiter(dup_of.keys(), dtype=np.int64, count=len(dup_of))
        is_dup = is_fetched & np.isin(ranks, dup_ranks)
    else:
        is_dup = np.zeros(len(fetched), dtype=bool)
    status[is_dup] = "duplicate"
    status[is_fetched & ~is_dup] = "html"
    if is_dup.any():
        dup_col[is_dup] = [dup_of[int(r)] for r in ranks[is_dup]]
    pages = fetched.copy()
    pages["status"] = status
    pages["dup_of"] = dup_col
    pages.loc[pages["status"] == "duplicate", "caption"] = ""  # html nulled on dup
    lt.write_table(pa.Table.from_pandas(pages, preserve_index=False), _gd(cfg.root, "pages", gen))

    # ---- bands + sigs index += non-dup pages (duplicates never become
    # winners and are never compared against — database.py:416-436)
    if bands_new_t is not None:
        dup_arr = np.fromiter(dup_of, dtype=np.int64, count=len(dup_of))
        keep = ~np.isin(bands_new_t["rank"].to_numpy(), dup_arr)
        kept = bands_new_t.filter(pa.array(keep))
        if kept.num_rows:
            writer = (
                _write_table_dist if kept.num_rows > _DIST_WRITE_MIN_ROWS else lt.write_table
            )
            writer(kept, _gd(cfg.root, "bands", gen), partition_col="bk_bucket")
        keep_s = ~np.isin(new_ranks, dup_arr)
        if keep_s.any():
            kept_ranks = new_ranks[keep_s]
            sig_t = pa.table(
                {
                    "rank": pa.array(kept_ranks, pa.int64()),
                    "sig": pa.array(
                        [new_sigs[i].tobytes() for i in np.flatnonzero(keep_s)],
                        pa.binary(),
                    ),
                    "sb": pa.array(
                        (kept_ranks % cfg.num_bk_buckets).astype(np.int32), pa.int32()
                    ),
                }
            )
            lt.write_table(sig_t, _gd(cfg.root, "sigs", gen), partition_col="sb")
    mark("pages_bands_write")

    counts = {
        "n_html": int((status == "html").sum()),
        "n_duplicate": int((status == "duplicate").sum()),
        "n_disallowed": int((status == "disallowed").sum()),
        "n_binary": int((status == "binary").sum()),
        # feeds the next generation's byte-aware driver/distributed switch
        "caption_bytes": int(fetched["caption"].str.len().sum()),
        "gen_path": "driver",
    }
    nondup = pages[pages["status"] == "html"]
    nondup_ri = pa.Table.from_pandas(nondup[["rank", "idx"]], preserve_index=False)
    return counts, nondup_ri


def _generation_distributed(cfg: CrawlConfig, corpus_path: str, gen: int, adm_t: pa.Table, mark):
    """Distributed page path of one generation: fetch → dedup → classify →
    pages/bands/sigs writes, all streaming — the driver sees only
    policy-bounded scalar projections ((rank, status, idx) of the admitted
    set) and the dup-rate-bounded edge set. Captions never transit the
    driver (at 25 M pages × caption per generation the round-2 driver
    materialization was multi-GB through one process — VERDICT r2 item 2).

    → (status counts for metrics, (rank, idx) table of non-dup html pages)."""
    import uuid as _uuid

    import ray as _ray
    import ray.data as rd

    nbk = cfg.num_bk_buckets
    fetched = (
        rd.from_arrow(adm_t)
        .groupby("part")
        .map_groups(_make_fetch_fn(cfg, corpus_path, gen), batch_format="pyarrow")
        .materialize()
    )
    def _small_proj(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        # cap_len rides the scalar projection (8 B/row) so the byte-aware
        # path switch can estimate caption width without captions ever
        # transiting the driver
        return pa.table(
            {
                "rank": b["rank"],
                "status": b["status"],
                "idx": b["idx"],
                "cap_len": _pc.utf8_length(b["caption"]),
            }
        )

    small = fetched.map_batches(_small_proj, batch_format="pyarrow").to_pandas()
    status0 = small["status"].to_numpy()
    ranks_small = small["rank"].to_numpy()
    n_fetched = int((status0 == "fetched").sum())
    mark("fetch")

    dup_of: dict[int, int] = {}
    bands_dir = _gd(cfg.root, "bands", gen)
    sigs_dir = _gd(cfg.root, "sigs", gen)
    if n_fetched:
        os.makedirs(bands_dir, exist_ok=True)
        os.makedirs(sigs_dir, exist_ok=True)
        btmp = os.path.join(bands_dir, f".tmp-{_uuid.uuid4().hex[:8]}")
        stmp = os.path.join(sigs_dir, f".tmp-{_uuid.uuid4().hex[:8]}")
        os.makedirs(btmp, exist_ok=True)
        os.makedirs(stmp, exist_ok=True)
        meta = (
            fetched.map_batches(
                _make_sig_writer(nbk, btmp, stmp), batch_format="pyarrow", batch_size=512
            )
            .to_pandas()  # fragment METADATA only — tiny
        )
        mark("dedup_sig")
        band_meta = meta[meta["kind"] == "bands"]
        sig_meta = meta[meta["kind"] == "sigs"]
        new_paths_by_bucket: dict[int, list[str]] = {}
        for p, k in zip(band_meta["path"], band_meta["partition"]):
            new_paths_by_bucket.setdefault(int(k), []).append(os.path.join(btmp, p))
        new_sig_paths_by_sb: dict[int, list[str]] = {}
        for p, k in zip(sig_meta["path"], sig_meta["partition"]):
            new_sig_paths_by_sb.setdefault(int(k), []).append(os.path.join(stmp, p))
        buckets = sorted(new_paths_by_bucket)
        old_by_bucket, old_sigs_by_sb = _old_index_paths(cfg, buckets)
        old_sig_refs = _sig_refs(old_sigs_by_sb)
        mark("dedup_paths")
        pool = _verify_pool(_pool_size(nbk))
        _bcounts = (
            band_meta.groupby("partition")["num_rows"].sum().astype(int).to_dict()
        )
        Sb = _verify_subtasks(
            {int(k): v for k, v in _bcounts.items()}, len(pool), secs=dict(_LAST_BUCKET_SECS)
        )
        futs = [
            pool[(b + t * 17) % len(pool)].verify_staged.remote(
                b, new_paths_by_bucket[b], old_by_bucket[b],
                new_sig_paths_by_sb, old_sig_refs, nbk, cfg.band_key_cap,
                (t, Sb[b]) if Sb[b] > 1 else None,
            )
            for b in buckets
            for t in range(Sb.get(b, 1))
        ]
        edges = _collect_verify(_ray.get(futs)).to_pandas().drop_duplicates()
        mark("dedup_verify")
        html_ranks = np.sort(ranks_small[status0 == "fetched"])
        dup_of = _resolve_dups(edges, html_ranks)

        # commit the staged index, dropping duplicate ranks (per-partition
        # rewrite tasks; with no dups the staged fragments commit as-is)
        import pyarrow.parquet as _pq

        if dup_of:
            drop = np.fromiter(dup_of, dtype=np.int64, count=len(dup_of))
            ftask = _filter_ranks_remote()
            for tmp_in, dest, by_part in (
                (btmp, bands_dir, new_paths_by_bucket),
                (stmp, sigs_dir, new_sig_paths_by_sb),
            ):
                tmp_out = os.path.join(dest, f".tmp-{_uuid.uuid4().hex[:8]}")
                os.makedirs(tmp_out, exist_ok=True)
                frags = [
                    f
                    for f in _ray.get(
                        [ftask.remote(k, ps, tmp_out, drop) for k, ps in sorted(by_part.items())]
                    )
                    if f is not None
                ]
                if frags:
                    schema = _pq.read_schema(os.path.join(tmp_out, frags[0]["path"]))
                    lt._commit(dest, tmp_out, frags, schema=schema)
                else:
                    shutil.rmtree(tmp_out, ignore_errors=True)
                shutil.rmtree(tmp_in, ignore_errors=True)
        else:
            for tmp_in, dest, df_m in ((btmp, bands_dir, band_meta), (stmp, sigs_dir, sig_meta)):
                frags = [
                    {"path": p, "num_rows": int(n), "partition": int(k)}
                    for p, n, k in zip(df_m["path"], df_m["num_rows"], df_m["partition"])
                ]
                if frags:
                    schema = _pq.read_schema(os.path.join(tmp_in, frags[0]["path"]))
                    lt._commit(dest, tmp_in, frags, schema=schema)
                else:
                    shutil.rmtree(tmp_in, ignore_errors=True)
    mark("dedup")

    # ---- classify + write pages, streaming (dup map is dup-rate bounded)
    dup_items = sorted(dup_of.items())
    dup_ranks_arr = np.array([k for k, _ in dup_items], dtype=np.int64)
    dup_winners_arr = np.array([v for _, v in dup_items], dtype=np.int64)

    def classify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        stt = np.array(b["status"].to_pylist(), dtype=object)
        rr = b["rank"].to_numpy()
        is_f = stt == "fetched"
        dcol = np.full(n, -1, dtype=np.int64)
        if len(dup_ranks_arr):
            pos = np.minimum(np.searchsorted(dup_ranks_arr, rr), len(dup_ranks_arr) - 1)
            isdup = is_f & (dup_ranks_arr[pos] == rr)
        else:
            isdup = np.zeros(n, dtype=bool)
        stt[is_f & ~isdup] = "html"
        if isdup.any():
            stt[isdup] = "duplicate"
            dcol[isdup] = dup_winners_arr[pos[isdup]]
        out = b.set_column(
            b.schema.get_field_index("status"), "status", pa.array(stt, pa.string())
        )
        if isdup.any():  # html nulled on dup (database.py:416-436)
            caps = np.array(out["caption"].to_pylist(), dtype=object)
            caps[isdup] = ""
            out = out.set_column(
                out.schema.get_field_index("caption"), "caption", pa.array(caps, pa.string())
            )
        return out.append_column("dup_of", pa.array(dcol, pa.int64()))

    lt.write_dataset(
        fetched.map_batches(classify, batch_format="pyarrow"), _gd(cfg.root, "pages", gen)
    )
    mark("pages_bands_write")

    counts = {
        "n_html": n_fetched - len(dup_of),
        "n_duplicate": len(dup_of),
        "n_disallowed": int((status0 == "disallowed").sum()),
        "n_binary": int((status0 == "binary").sum()),
        "caption_bytes": int(small["cap_len"].sum()),
        "gen_path": "dist",
    }
    nd_mask = status0 == "fetched"
    if dup_of:
        nd_mask &= ~np.isin(ranks_small, dup_ranks_arr)
    order = np.argsort(ranks_small[nd_mask], kind="stable")
    nondup_ri = pa.table(
        {
            "rank": pa.array(ranks_small[nd_mask][order], pa.int64()),
            "idx": pa.array(small["idx"].to_numpy()[nd_mask][order], pa.int64()),
        }
    )
    return counts, nondup_ri


def _links_batch(b: pa.Table, spec_dict: dict, keywords: tuple, nuh: int) -> pa.Table:
    """Non-dup HTML pages → scored frontier-candidate link rows
    (M2 extraction + M1 canonical form + M13 priority), fully batched:
    link targets/anchors derive vectorized from the counter-based
    corpus streams, seq = (parent_rank+1)<<20 | link_idx."""
    spec = C.CorpusSpec(**spec_dict)
    ranks = b["rank"].to_numpy()
    page_idx = b["idx"].to_numpy()
    src, jj, targets, anchors = C.out_links_batch(spec, page_idx)
    # recover parent ranks: every page emits ≥3 links, so jj==0 marks
    # each page's first link in order
    starts = np.flatnonzero(jj == 0)
    counts = np.diff(np.append(starts, len(jj)))
    rank_rep = np.repeat(ranks, counts) if len(jj) else np.array([], np.int64)
    prios = link_priorities(anchors, keywords)
    urls = C.url_of_index(spec, targets)
    idxs = targets
    seqs = ((rank_rep + 1) << np.int64(SEQ_SHIFT)) | jj  # == semantics.link_seq
    from_ranks = rank_rep
    hosts = C.host_of_index(spec, np.asarray(idxs, dtype=np.int64)) if len(idxs) else np.array([], np.int32)
    uh = hash64(urls) if len(urls) else np.array([], np.uint64)
    return pa.table(
        {
            "from_rank": pa.array(from_ranks, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(uh, pa.uint64()),
            "idx": pa.array(np.asarray(idxs, dtype=np.int64), pa.int64()),
            "host_id": pa.array(hosts, pa.int32()),
            "priority": pa.array(np.asarray(prios, dtype=np.float64), pa.float64()),
            "seq": pa.array(np.asarray(seqs, dtype=np.int64), pa.int64()),
            "uh_bucket": pa.array((uh % np.uint64(nuh)).astype(np.int32), pa.int32()),
        }
    )



def _links_slice_task(
    t: pa.Table, off: int, n: int, spec_dict: dict, keywords: tuple, nuh: int
) -> pa.Table:
    return _links_batch(t.slice(off, n), spec_dict, keywords, nuh)


_LINKS_REMOTE = None


def _links_remote():
    global _LINKS_REMOTE
    if _LINKS_REMOTE is None:
        import ray as _ray

        _LINKS_REMOTE = _ray.remote(num_cpus=1)(_links_slice_task)
    return _LINKS_REMOTE


def _make_link_fn(cfg: CrawlConfig):
    spec_dict = cfg.params.spec.__dict__.copy()
    keywords = tuple(cfg.params.keywords)
    nuh = cfg.num_uh_buckets

    def links_batch(b: pa.Table) -> pa.Table:
        return _links_batch(b, spec_dict, keywords, nuh)

    return links_batch



def _merge_bucket(
    group: pa.Table,
    root: str,
    seen_gens: list[int],
    frontier_prev: str,
    bloom_gens: list[int],
    exact_confirm: bool = False,
) -> pa.Table:
    """One url_hash bucket of new links → accepted frontier rows.
    first-wins within the bucket, then bloom pre-filter + exact
    anti-join against the bucket's seen partitions, then an anti-join
    against the bucket's current frontier partition (a queued URL keeps
    its first-discovery priority — D1, Estrella.py:548-554).

    ``exact_confirm`` (CrawlConfig.exact_url_confirm) closes the 64-bit
    url_hash identity risk (SCALE.md): a candidate is only dropped when
    the URL STRING itself is seen/queued, not merely its hash — the
    string compare runs only on hash-matched rows inside the bucket the
    candidate already lives in (no extra shuffle, no broadcast)."""
    bucket = int(group["uh_bucket"][0].as_py())
    df = group.to_pandas().sort_values("seq", kind="stable")
    df = df.drop_duplicates("url" if exact_confirm else "url_hash", keep="first")
    uh = df["url_hash"].to_numpy().astype(np.uint64)
    # bloom files are sparse across generations (only touched buckets get
    # a new file); bloom_gens maps bucket → generation of its latest file
    with open(
        os.path.join(root, "blooms", f"gen{bloom_gens[bucket]}", f"bloom-{bucket}.bin"), "rb"
    ) as f:
        bloom = seen_filter_from_bytes(f.read())
    maybe = bloom.contains_many(uh)
    if maybe.any():
        seen_cols = ["url_hash", "url"] if exact_confirm else ["url_hash"]
        seen_tabs = []
        for g in seen_gens:
            p = _gd(root, "seen", g)
            if lt.exists(p):
                try:
                    seen_tabs.append(lt.read_pyarrow(p, columns=seen_cols, partitions=[bucket]))
                except FileNotFoundError:
                    pass
        if seen_tabs:
            seen_arr = np.concatenate([t["url_hash"].to_numpy() for t in seen_tabs])
            drop = maybe & np.isin(uh, seen_arr)
            if exact_confirm and drop.any():
                hit = set()
                for t in seen_tabs:
                    m = np.isin(t["url_hash"].to_numpy(), uh[drop])
                    if m.any():
                        hit.update(np.asarray(t["url"].to_pandas())[m].tolist())
                drop &= df["url"].isin(hit).to_numpy()
            df = df[~drop]
            uh = df["url_hash"].to_numpy().astype(np.uint64)
    try:
        fr_cols = ["url_hash", "url"] if exact_confirm else ["url_hash"]
        fr = lt.read_pyarrow(frontier_prev, columns=fr_cols, partitions=[bucket])
        queued = fr["url_hash"].to_numpy()
        qdrop = np.isin(uh, queued)
        if exact_confirm and qdrop.any():
            m = np.isin(queued, uh[qdrop])
            qset = set(np.asarray(fr["url"].to_pandas())[m].tolist())
            qdrop &= df["url"].isin(qset).to_numpy()
        df = df[~qdrop]
    except FileNotFoundError:
        pass
    out = df[FRONTIER_COLS]
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("url", pa.string()),
                ("url_hash", pa.uint64()),
                ("idx", pa.int64()),
                ("host_id", pa.int32()),
                ("priority", pa.float64()),
                ("seq", pa.int64()),
                ("uh_bucket", pa.int32()),
            ]
        )
    )



_MERGE_REMOTE = None


def _merge_remote():
    global _MERGE_REMOTE
    if _MERGE_REMOTE is None:
        import ray as _ray

        _MERGE_REMOTE = _ray.remote(num_cpus=1)(_merge_bucket_of)
    return _MERGE_REMOTE


def _merge_bucket_of(
    cand: pa.Table,
    bucket: int,
    root: str,
    seen_gens: list,
    frontier_prev: str,
    bloom_gens: list,
    exact_confirm: bool = False,
) -> pa.Table:
    """Raw-task wrapper: filter the broadcast candidate table to one bucket
    (ships via ONE ray.put) and merge it — the driver-path merge loop was 32
    serial disk-read anti-joins per generation."""
    ubs = cand["uh_bucket"].to_numpy()
    sub = cand.filter(pa.array(ubs == bucket))
    return _merge_bucket(sub, root, seen_gens, frontier_prev, bloom_gens, exact_confirm)


def _make_merge_fn(
    cfg: CrawlConfig,
    gen: int,
    seen_gens: list[int],
    frontier_prev: str,
    bloom_gens: list[int],
):
    root = cfg.root
    exact_confirm = cfg.exact_url_confirm

    def merge_bucket(group: pa.Table) -> pa.Table:
        return _merge_bucket(group, root, seen_gens, frontier_prev, bloom_gens, exact_confirm)

    return merge_bucket



# ------------------------------------------------------------- generation ----


def _admission(
    cfg: CrawlConfig,
    frontier_path: str,
    rank_base: int,
    frontier_ds=None,
    frontier_mem_t: pa.Table | None = None,
) -> pd.DataFrame:
    import ray.data  # noqa: F401  (lazy; driver initialises Ray)

    params = cfg.params
    spec_dict = params.spec.__dict__.copy()
    politeness, factor = params.politeness, params.politeness_factor
    cap = params.max_pages - rank_base
    if params.gen_page_cap is not None:
        cap = min(cap, params.gen_page_cap)
    n_frontier = lt.read_manifest(frontier_path)["num_rows"]
    if n_frontier <= cfg.driver_path_max_rows:
        # whole-frontier driver path: at sandbox scale (or early crawl) the
        # frontier fits trivially; the pandas code below is the same
        # budget/top-k/cap semantics with zero pipeline launches
        fr = (
            frontier_mem_t
            if frontier_mem_t is not None
            else lt.read_pyarrow(frontier_path, columns=FRONTIER_COLS)
        ).to_pandas()
        fr = fr.sort_values(["priority", "seq"], kind="stable")
        if politeness:
            spec = C.CorpusSpec(**spec_dict)
            budgets = {
                int(h): C.robots_for_host(spec, int(h)).crawl_delay_slots * factor
                for h in fr["host_id"].unique()
            }
            adm = fr.groupby("host_id", group_keys=False).apply(
                lambda g: g.head(budgets[int(g.name)])
            )
            adm = adm.sort_values(["priority", "seq"], kind="stable").head(cap)
        else:
            adm = fr.head(cap)
        adm = adm.reset_index(drop=True)
        return _finish_admission(cfg, adm, rank_base)
    # the previous generation keeps its frontier materialized in the object
    # store — re-reading the checkpoint from disk is only needed on resume
    ds = (
        frontier_ds.map_batches(
            lambda b: b.select(FRONTIER_COLS), batch_format="pyarrow"
        )
        if frontier_ds is not None
        else lt.read_dataset(frontier_path, columns=FRONTIER_COLS)
    )
    if politeness:
        def local_prune(b: pa.Table) -> pa.Table:
            """Per-block combiner: keep at most budget(h) rows per host before
            the host shuffle (partial top-k, SURVEY 'pre-aggregate')."""
            spec = C.CorpusSpec(**spec_dict)
            df = b.to_pandas().sort_values(["priority", "seq"], kind="stable")
            budgets = {
                int(h): C.robots_for_host(spec, int(h)).crawl_delay_slots * factor
                for h in df["host_id"].unique()
            }
            return pa.Table.from_pandas(
                df.groupby("host_id", group_keys=False).apply(
                    lambda g: g.head(budgets[int(g.name)])
                ),
                preserve_index=False,
            )

        def host_topk(g: pd.DataFrame) -> pd.DataFrame:
            spec = C.CorpusSpec(**spec_dict)
            budget = C.robots_for_host(spec, int(g["host_id"].iloc[0])).crawl_delay_slots * factor
            return g.sort_values(["priority", "seq"], kind="stable").head(budget)

        # after the per-host budget cut the survivor set is bounded by the
        # politeness budget (Σ host slots) — finish the global order + cap on
        # the driver instead of paying a distributed sort of a bounded set.
        # The exact cross-block per-host top-k needs a host shuffle only when
        # the frontier is large (many blocks); below the threshold the
        # per-block combiner output is small enough to finish on the driver
        # (same result, no shuffle) — a broadcast-vs-shuffle style plan choice.
        # (the driver path above already returned for small frontiers, so this
        # branch always needs the exact cross-block per-host top-k shuffle)
        pruned = ds.map_batches(local_prune, batch_format="pyarrow")
        pruned = pruned.groupby("host_id").map_groups(host_topk, batch_format="pandas")
        adm = pruned.to_pandas()
    else:
        # global best-first prefix: per-block partial top-cap (combiner),
        # merged and re-capped on the driver
        def block_topcap(b: pa.Table) -> pa.Table:
            df = b.to_pandas().sort_values(["priority", "seq"], kind="stable")
            return pa.Table.from_pandas(df.head(cap), preserve_index=False)

        adm = ds.map_batches(block_topcap, batch_format="pyarrow").to_pandas()
    if adm.empty:
        return adm
    adm = (
        adm.sort_values(["priority", "seq"], kind="stable").head(cap).reset_index(drop=True)
    )
    return _finish_admission(cfg, adm, rank_base)


def _finish_admission(cfg: CrawlConfig, adm: pd.DataFrame, rank_base: int) -> pd.DataFrame:
    if adm.empty:
        return adm
    adm = adm.copy()
    adm["rank"] = rank_base + np.arange(len(adm), dtype=np.int64)
    # hot-host salting: split any host exceeding hot_threshold admitted rows
    counts = adm["host_id"].value_counts()
    hot = set(counts[counts > cfg.hot_threshold].index)
    base = C.bucket_of_host(cfg.params.spec, adm["host_id"].to_numpy()).astype(np.int64)
    salt = np.where(
        adm["host_id"].isin(hot).to_numpy(),
        adm["idx"].to_numpy() % cfg.hot_salts,
        0,
    )
    adm["part"] = (base * cfg.hot_salts + salt).astype(np.int32)
    return adm


def _seen_bloom_bucket_task(
    bucket: int,
    sub: pa.Table,
    tmp_dir: str,
    bloom_src: str,
    bloom_dst: str,
) -> dict:
    """One url_hash bucket of the admitted set → (a) the generation's seen
    fragment for that bucket, (b) the bucket's updated bloom file (read the
    latest file → add the new hashes → write gen's file). Distributed per
    bucket because at the 10^10 design point EVERY bucket admits rows every
    generation — a driver loop there is O(num_buckets) serial filter I/O per
    generation (the last such loop in the hot path). The driver commits only
    the seen manifest and the bucket→generation bloom map in state.json."""
    import uuid as _uuid

    import pyarrow.parquet as _pq

    frag = f"part={bucket}/frag-{_uuid.uuid4().hex[:8]}.parquet"
    os.makedirs(os.path.join(tmp_dir, f"part={bucket}"), exist_ok=True)
    _pq.write_table(sub, os.path.join(tmp_dir, frag))
    # the src must exist (bootstrap writes gen0 for every bucket; the resume
    # fallback rebuilds lost files) — a silently-fresh bloom would violate
    # the superset-of-seen invariant and re-admit previously-seen URLs
    with open(bloom_src, "rb") as f:
        bloom = seen_filter_from_bytes(f.read())
    bloom.add_many(sub["url_hash"].to_numpy().astype(np.uint64))
    tmp_bloom = bloom_dst + f".tmp-{_uuid.uuid4().hex[:8]}"
    with open(tmp_bloom, "wb") as f:
        f.write(bloom.to_bytes())
    os.replace(tmp_bloom, bloom_dst)
    return {"path": frag, "num_rows": sub.num_rows, "partition": bucket}


_SEEN_BLOOM_REMOTE = None


def _seen_bloom_remote():
    global _SEEN_BLOOM_REMOTE
    if _SEEN_BLOOM_REMOTE is None:
        import ray as _ray

        _SEEN_BLOOM_REMOTE = _ray.remote(num_cpus=1)(_seen_bloom_bucket_task)
    return _SEEN_BLOOM_REMOTE


def _write_part_task(partition: int, table: pa.Table, partition_col: str, tmp_dir: str) -> dict:
    import uuid as _uuid

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    sub = table.filter(_pc.equal(table[partition_col], partition))
    frag = f"part={partition}/frag-{_uuid.uuid4().hex[:8]}.parquet"
    os.makedirs(os.path.join(tmp_dir, f"part={partition}"), exist_ok=True)
    _pq.write_table(sub, os.path.join(tmp_dir, frag))
    return {"path": frag, "num_rows": sub.num_rows, "partition": partition}


_WRITE_PART_REMOTE = None


def _write_part_remote():
    global _WRITE_PART_REMOTE
    if _WRITE_PART_REMOTE is None:
        import ray as _ray

        _WRITE_PART_REMOTE = _ray.remote(num_cpus=1)(_write_part_task)
    return _WRITE_PART_REMOTE


def _write_table_dist(table: pa.Table, path: str, partition_col: str) -> dict:
    """Partitioned checkpoint write as one Ray task per partition: the table
    ships to the object store ONCE (zero-copy to workers), each task filters
    and parquet-encodes its partition, the driver only commits the manifest.
    The driver-path frontier/bands rewrites were serial parquet encodes of
    every partition per generation — a measurable slice of the 16-cpu
    per-generation floor."""
    import uuid as _uuid

    import ray as _ray

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{_uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    parts = sorted(set(table[partition_col].to_numpy().tolist()))
    tref = _ray.put(table)
    task = _write_part_remote()
    frags = _ray.get([task.remote(int(p), tref, partition_col, tmp) for p in parts])
    return lt._commit(path, tmp, frags, schema=table.schema)


# rows above which a driver-path partitioned checkpoint write fans out as
# per-partition Ray tasks instead of the in-process thread pool
_DIST_WRITE_MIN_ROWS = 20_000


def _compact_bucket_task(bucket: int, paths: list[str], tmp_dir: str) -> dict:
    import uuid as _uuid

    import pyarrow.parquet as _pq

    t = pa.concat_tables([_pq.read_table(p) for p in paths])
    frag = f"part={bucket}/frag-{_uuid.uuid4().hex[:8]}.parquet"
    os.makedirs(os.path.join(tmp_dir, f"part={bucket}"), exist_ok=True)
    _pq.write_table(t, os.path.join(tmp_dir, frag))
    return {"path": frag, "num_rows": t.num_rows, "partition": bucket}


_COMPACT_REMOTE = None


def _compact_remote():
    global _COMPACT_REMOTE
    if _COMPACT_REMOTE is None:
        import ray as _ray

        _COMPACT_REMOTE = _ray.remote(num_cpus=1)(_compact_bucket_task)
    return _COMPACT_REMOTE


def _compact_generational(cfg: CrawlConfig, name: str, upto_gen: int) -> None:
    """Fold {name}/gen1..gen{upto} into one table at gen{upto} (same
    partitioning). Readers union generations, so replacing N small per-gen
    tables with one compacted table at the newest gen id is observationally
    identical; older gen directories are removed after the atomic manifest
    commit.

    The rewrite is DISTRIBUTED per partition bucket: each Ray task reads
    only its bucket's fragments across generations and writes one compacted
    fragment (seen ≈ 1.2 TB at the 10^10 design point — a driver-side
    concat would materialize all of it). The manifest commit on the driver
    stays atomic; a crash mid-compaction leaves only an uncommitted tmp dir
    behind (never a broken table)."""
    import uuid as _uuid

    import pyarrow.parquet as _pq
    import ray as _ray

    gens = [g for g in _gens_of(cfg.root, name) if g <= upto_gen]
    if len(gens) < 2:
        return
    frag_lists: dict[int, list[str]] = {}
    for g in gens:
        p = _gd(cfg.root, name, g)
        man = lt.read_manifest(p)
        for fr in man["fragments"]:
            part = fr.get("partition")
            if part is not None:
                frag_lists.setdefault(int(part), []).append(os.path.join(p, fr["path"]))
    dest = _gd(cfg.root, name, gens[-1])
    tmp = os.path.join(dest, f".tmp-{_uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    task = _compact_remote()
    frags = _ray.get(
        [task.remote(b, ps, tmp) for b, ps in sorted(frag_lists.items())]
    )
    schema = _pq.read_schema(os.path.join(tmp, frags[0]["path"])) if frags else pa.schema([])
    lt._commit(dest, tmp, frags, schema=schema)
    for g in gens[:-1]:
        shutil.rmtree(_gd(cfg.root, name, g), ignore_errors=True)
    # drop gen-upto's pre-compaction fragments (unreferenced by the new
    # manifest version; readers only trust manifest-listed files)
    live = {os.path.join(dest, f["path"]) for f in frags}
    for root_, _dirs, files in os.walk(dest):
        for fn in files:
            full = os.path.join(root_, fn)
            if fn.endswith(".parquet") and full not in live:
                os.remove(full)


def compact_seen(cfg: CrawlConfig, upto_gen: int) -> None:
    _compact_generational(cfg, "seen", upto_gen)


def compact_index(cfg: CrawlConfig, upto_gen: int) -> None:
    """SCALE.md debt #4: fold the dedup bands + sigs side tables the same
    way (one fragment per bucket per generation otherwise accumulates
    O(generations) files the verify tasks must open)."""
    _compact_generational(cfg, "bands", upto_gen)
    _compact_generational(cfg, "sigs", upto_gen)


def _seed_avg_caption_width(cfg: CrawlConfig) -> float:
    """Resume seed for the byte-aware path switch: the last committed
    generation's metrics carry (caption_bytes, n_html + n_duplicate).
    Returns 0.0 (row-bound-only) for fresh crawls / legacy checkpoints."""
    gens = _gens_of(cfg.root, "metrics")
    if not gens:
        return 0.0
    t = lt.read_pyarrow(_gd(cfg.root, "metrics", gens[-1]))
    if "caption_bytes" not in t.column_names:
        return 0.0
    n = int(t["n_html"][0].as_py()) + int(t["n_duplicate"][0].as_py())
    return (int(t["caption_bytes"][0].as_py()) / n) if n else 0.0


def run_crawl(cfg: CrawlConfig, corpus_path: str | None = None, resume: bool = True) -> CrawlResult:
    """Run (or resume) the crawl to completion or ``cfg.max_generations``."""
    import ray.data as rd

    params = cfg.params
    if corpus_path is None:
        corpus_path = C.build_corpus(
            params.spec, C.corpus_path(os.path.join(cfg.root, "..", "corpus"), params.spec)
        )
    st = _load_state(cfg.root) if resume else None
    if st is None:
        if os.path.isdir(cfg.root):
            shutil.rmtree(cfg.root)
        st = _bootstrap(cfg)
    else:
        _rollback(cfg.root, st["gen"])
        if "bloom_gen" not in st or max(st["bloom_gen"]) > st["gen"]:
            # legacy checkpoint (pre-sparse-bloom) or a state rewound past
            # generations its bloom map references — rebuild from disk, which
            # is authoritative after rollback
            st["bloom_gen"] = _bloom_gens_fallback(cfg, st["gen"])
    result = CrawlResult(root=cfg.root)
    _LAST_BUCKET_SECS.clear()  # cost signal must not leak across crawls
    gens_this_run = 0
    frontier_mem = None    # previous generation's frontier (Dataset, big-crawl path)
    frontier_mem_t = None  # previous generation's frontier (pa.Table, driver path)
    avg_cap_w = _seed_avg_caption_width(cfg)  # byte-aware path switch estimate
    while not st["finished"]:
        if cfg.max_generations is not None and gens_this_run >= cfg.max_generations:
            break
        gen = st["gen"] + 1
        rank_base = st["rank"]
        t0 = time.perf_counter()
        stage_t: dict[str, float] = {}

        def _mark(name: str, _last=[t0]):
            now = time.perf_counter()
            stage_t[name] = round(now - _last[0], 3)
            _last[0] = now

        frontier_prev = _gd(cfg.root, "frontier", gen - 1)
        adm = _admission(
            cfg, frontier_prev, rank_base, frontier_ds=frontier_mem, frontier_mem_t=frontier_mem_t
        )
        _mark("admission")
        if adm.empty or rank_base >= params.max_pages:
            st["finished"] = True
            _save_state(cfg.root, st)
            break
        n_adm = len(adm)

        # ---- seen += admitted (write first: links must anti-join against it).
        # Both the seen-fragment write AND the bloom add+rewrite run as one
        # distributed task per touched bucket; untouched buckets keep their
        # existing bloom file, tracked by the per-bucket bloom_gen map
        # committed with state.json. At SCALE.md's 64k buckets every bucket
        # is touched every generation — a driver loop here was the last
        # O(all-buckets) serial I/O in the hot path. The commit stays
        # driver-side and atomic: blooms are derived state (rebuildable from
        # seen), and seen fragments are invisible until the manifest lands.
        import uuid as _uuid

        import ray as _ray

        seen_t = pa.table(
            {
                "url": pa.array(adm["url"], pa.string()),
                "url_hash": pa.array(adm["url_hash"].to_numpy().astype(np.uint64), pa.uint64()),
                "uh_bucket": pa.array(adm["uh_bucket"].to_numpy().astype(np.int32), pa.int32()),
            }
        )
        seen_dir = _gd(cfg.root, "seen", gen)
        os.makedirs(seen_dir, exist_ok=True)
        seen_tmp = os.path.join(seen_dir, f".tmp-{_uuid.uuid4().hex[:8]}")
        os.makedirs(seen_tmp, exist_ok=True)
        os.makedirs(os.path.join(cfg.root, "blooms", f"gen{gen}"), exist_ok=True)
        uh_all = adm["url_hash"].to_numpy().astype(np.uint64)
        ub_all = adm["uh_bucket"].to_numpy()
        bloom_gens: list[int] = list(st["bloom_gen"])
        sb_task = _seen_bloom_remote()
        sb_futs = []
        touched = [int(b) for b in np.unique(ub_all)]
        for b in touched:
            sb_futs.append(
                sb_task.remote(
                    b,
                    seen_t.filter(pa.array(ub_all == b)),
                    seen_tmp,
                    os.path.join(cfg.root, "blooms", f"gen{bloom_gens[b]}", f"bloom-{b}.bin"),
                    os.path.join(cfg.root, "blooms", f"gen{gen}", f"bloom-{b}.bin"),
                )
            )
        lt._commit(seen_dir, seen_tmp, _ray.get(sb_futs), schema=seen_t.schema)
        for b in touched:
            bloom_gens[b] = gen
        _mark("seen_bloom")

        # ---- fetch → dedup → classify → pages/bands/sigs writes
        adm_t = pa.Table.from_pandas(adm, preserve_index=False)
        est_page_bytes = int(len(adm) * avg_cap_w)
        use_driver = (
            len(adm) <= cfg.driver_path_max_rows
            and est_page_bytes <= cfg.driver_path_max_bytes
        )
        if not use_driver:
            # distributed page path: everything stays a Dataset / staged
            # fragments; the driver sees only (rank, status, idx) + dup edges
            counts, nondup_ri = _generation_distributed(cfg, corpus_path, gen, adm_t, _mark)
        else:
            counts, nondup_ri = _generation_driver(cfg, corpus_path, gen, adm_t, _mark)

        # ---- links + frontier update
        n_links = 0
        accepted_t = None       # driver-path accepted links (pa.Table)
        accepted_ds = None      # distributed-path accepted links (Dataset)
        driver_sets = cfg.driver_path_max_rows
        # S4: sitemap injection for hosts first visited this generation —
        # triggered by ADMISSION (before robots/fetch outcome, matching the
        # reference's crawl_page preamble); candidate rows join the link
        # merge below. Per-generation new hosts are bounded by the admitted
        # set, so deriving them driver-side stays O(admitted).
        sm_hosts = set(st.get("sm_hosts", []))
        sm_t = None
        if params.sitemaps:
            first_rank = adm.groupby("host_id")["rank"].min()
            rows: list = []
            for h, r in first_rank.items():
                h = int(h)
                if h in sm_hosts:
                    continue
                sm_hosts.add(h)
                rows.extend(sitemap_discoveries(params.spec, h, int(r)))
            if rows:
                sm_t = _frontier_row_table(
                    cfg,
                    [x[0] for x in rows],
                    [x[3] for x in rows],
                    [x[1] for x in rows],
                    [x[2] for x in rows],
                ).select(FRONTIER_COLS)
        cand_tabs = []          # driver-path candidate tables
        cand_ds = None          # distributed-path candidates (Dataset)
        if nondup_ri.num_rows:
            link_fn = _make_link_fn(cfg)
            if nondup_ri.num_rows * 16 <= max(driver_sets, 1):
                # the generation's pages are politeness-budget bounded, so
                # their links are too — vectorized derivation on the driver
                # path skips two pipeline launches; above the threshold the
                # link rows stay a DATASET end-to-end (derive → write →
                # merge): at 25 M pages × ~16 links each, pulling them
                # through the driver was the round-2 residue
                if nondup_ri.num_rows > 1024:
                    # fan the derivation out as raw slice tasks (one ray.put,
                    # workers slice) — the serial vectorized derivation was
                    # ~1.4 s/run of the 16-cpu bench's crawl floor
                    tref = _ray.put(nondup_ri)
                    ltask = _links_remote()
                    spec_dict_l = params.spec.__dict__.copy()
                    kws = tuple(params.keywords)
                    link_t = pa.concat_tables(
                        _ray.get(
                            [
                                ltask.remote(
                                    tref, o, 1024, spec_dict_l, kws, cfg.num_uh_buckets
                                )
                                for o in range(0, nondup_ri.num_rows, 1024)
                            ]
                        )
                    )
                else:
                    link_t = link_fn(nondup_ri)
                n_links = link_t.num_rows
                lt.write_table(link_t.select(["from_rank", "url"]), _gd(cfg.root, "links", gen))
                cand_tabs.append(link_t.select(FRONTIER_COLS))
            else:
                links_ds = (
                    rd.from_arrow(nondup_ri)
                    .repartition(max(1, min(64, nondup_ri.num_rows // 256)))
                    .map_batches(link_fn, batch_format="pyarrow")
                    .materialize()
                )
                n_links = links_ds.count()
                lt.write_dataset(
                    links_ds.map_batches(
                        lambda b: b.select(["from_rank", "url"]), batch_format="pyarrow"
                    ),
                    _gd(cfg.root, "links", gen),
                )
                cand_ds = links_ds.map_batches(
                    lambda b: b.select(FRONTIER_COLS), batch_format="pyarrow"
                )
            _mark("links")
        if sm_t is not None:
            if cand_ds is not None:
                cand_ds = cand_ds.union(rd.from_arrow(sm_t))
            else:
                cand_tabs.append(sm_t)
        merge_fn = _make_merge_fn(
            cfg, gen, list(range(1, gen + 1)), frontier_prev, bloom_gens
        )
        if cand_ds is not None:
            accepted_ds = cand_ds.groupby("uh_bucket").map_groups(
                merge_fn, batch_format="pyarrow"
            )
        elif cand_tabs:
            link_cand = cand_tabs[0] if len(cand_tabs) == 1 else pa.concat_tables(cand_tabs)
            if link_cand.num_rows <= driver_sets:
                ubs = link_cand["uh_bucket"].to_numpy()
                buckets_m = np.unique(ubs)
                if link_cand.num_rows > _DIST_WRITE_MIN_ROWS and len(buckets_m) > 1:
                    # raw task per bucket (candidates ship via ONE ray.put;
                    # each task does its own bucket-pruned disk anti-joins) —
                    # the serial loop was a measurable per-generation floor
                    cref = _ray.put(link_cand)
                    mtask = _merge_remote()
                    parts = _ray.get(
                        [
                            mtask.remote(
                                cref, int(b), cfg.root, list(range(1, gen + 1)),
                                frontier_prev, bloom_gens, cfg.exact_url_confirm,
                            )
                            for b in buckets_m
                        ]
                    )
                else:
                    # tiny candidate sets: merge in-process (reads stay
                    # bucket-pruned), no task round-trips
                    parts = [
                        merge_fn(link_cand.filter(pa.array(ubs == b)))
                        for b in buckets_m
                    ]
                if parts:
                    accepted_t = pa.concat_tables(parts)
            else:
                accepted_ds = (
                    rd.from_arrow(link_cand)
                    .groupby("uh_bucket")
                    .map_groups(merge_fn, batch_format="pyarrow")
                )
        adm_hashes = uh_all
        n_front_prev = int(lt.read_manifest(frontier_prev)["num_rows"])
        if accepted_ds is None and n_front_prev <= driver_sets:
            # whole-frontier driver path: filter admitted rows out, append the
            # accepted links, write the checkpoint, keep the table in memory
            prev_t = (
                frontier_mem_t
                if frontier_mem_t is not None
                else lt.read_pyarrow(frontier_prev, columns=FRONTIER_COLS)
            ).select(FRONTIER_COLS)
            keep_mask = ~np.isin(prev_t["url_hash"].to_numpy().astype(np.uint64), adm_hashes)
            next_t = prev_t.filter(pa.array(keep_mask))
            if accepted_t is not None and accepted_t.num_rows:
                next_t = pa.concat_tables([next_t, accepted_t.select(FRONTIER_COLS).cast(next_t.schema)])
            writer = (
                _write_table_dist if next_t.num_rows > _DIST_WRITE_MIN_ROWS else lt.write_table
            )
            man = writer(next_t, _gd(cfg.root, "frontier", gen), partition_col="uh_bucket")
            frontier_mem_t, frontier_mem = next_t, None
        else:
            keep_fn = _make_keep_fn(adm_hashes)
            keep_src = (
                frontier_mem
                if frontier_mem is not None
                else lt.read_dataset(frontier_prev, columns=FRONTIER_COLS)
            )
            keep_ds = keep_src.map_batches(keep_fn, batch_format="pyarrow")
            if accepted_ds is None and accepted_t is not None and accepted_t.num_rows:
                accepted_ds = rd.from_arrow(accepted_t)
            next_frontier = keep_ds.union(accepted_ds) if accepted_ds is not None else keep_ds
            # partition by a throwaway copy of uh_bucket: hive-partitioning
            # strips the partition column from the data files, and re-reading
            # it as a hive string would corrupt the frontier schema
            next_frontier = next_frontier.map_batches(
                lambda b: b.append_column("part", b["uh_bucket"]), batch_format="pyarrow"
            ).materialize()
            frontier_mem, frontier_mem_t = next_frontier, None
            man = lt.write_dataset(next_frontier, _gd(cfg.root, "frontier", gen), partition_col="part")
        _mark("frontier_write")

        # ---- metrics + commit
        secs = time.perf_counter() - t0
        if _VERIFY_WAVE:  # per-task skew audit rides inside stage_secs JSON
            stage_t.update(_VERIFY_WAVE)
            _VERIFY_WAVE.clear()
        m = {
            "gen": gen,
            "n_frontier_in": int(lt.read_manifest(frontier_prev)["num_rows"]),
            "n_admitted": int(n_adm),
            "n_html": int(counts["n_html"]),
            "n_duplicate": int(counts["n_duplicate"]),
            "n_disallowed": int(counts["n_disallowed"]),
            "n_binary": int(counts["n_binary"]),
            "n_links": int(n_links),
            "n_frontier_out": int(man["num_rows"]),
            "secs": float(secs),
            "stage_secs": json.dumps(stage_t),
            "caption_bytes": int(counts.get("caption_bytes", 0)),
            "gen_path": str(counts.get("gen_path", "")),
        }
        lt.write_table(pa.table({k: [v] for k, v in m.items()}), _gd(cfg.root, "metrics", gen))
        result.metrics.append(m)
        n_f = int(counts["n_html"]) + int(counts["n_duplicate"])
        if n_f:  # refresh the width estimate for the next generation's switch
            avg_cap_w = counts.get("caption_bytes", 0) / n_f
        st = {
            "gen": gen,
            "rank": rank_base + n_adm,
            "finished": False,
            "bloom_gen": bloom_gens,
            "sm_hosts": sorted(sm_hosts),
        }
        if st["rank"] >= params.max_pages:
            st["finished"] = True
        _save_state(cfg.root, st)
        # bloom GC: generation dirs older than every bucket's latest file are
        # unreferenced by the just-committed state and can never be needed
        # again (rollback only ever deletes dirs NEWER than committed state)
        min_live = min(bloom_gens)
        blooms_base = os.path.join(cfg.root, "blooms")
        for d in os.listdir(blooms_base):
            if d.startswith("gen") and int(d[3:]) < min_live:
                shutil.rmtree(os.path.join(blooms_base, d), ignore_errors=True)
        if cfg.compact_seen_every and gen % cfg.compact_seen_every == 0:
            compact_seen(cfg, gen)
            compact_index(cfg, gen)
        gens_this_run += 1

    final = _load_state(cfg.root)
    result.n_pages = final["rank"]
    result.n_generations = final["gen"]
    result.finished = final["finished"]
    return result


def _make_keep_fn(adm_hashes: np.ndarray):
    def keep(b: pa.Table) -> pa.Table:
        uh = b["url_hash"].to_numpy().astype(np.uint64)
        return b.filter(pa.array(~np.isin(uh, adm_hashes))).select(FRONTIER_COLS)

    return keep

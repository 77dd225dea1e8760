"""Crawl-engine pipelines bound to the driver contract (rows-only checks).

These run over the deterministic synthetic corpus (built on demand under
/tmp, keyed by spec — same seed ⇒ same bytes ⇒ reproducible), NOT over the
TPC-H-ish tables, so they have no DuckDB oracle; the parity gate for them is
tests/test_crawl_parity.py against the sequential oracle crawler.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.codecs import decode_image, encode_image, psnr
from ..functions.hashing import phash64
from ..sources import corpus as C
from ..sources import lance_table as lt

SCRATCH = "/tmp/ieps_crawler_ray"

FLAGSHIP_SPEC = C.CorpusSpec(n_images=2_000, n_hosts=16, num_buckets=8)


def _corpus(spec: C.CorpusSpec) -> str:
    return C.build_corpus(spec, C.corpus_path(SCRATCH, spec))


def _pool() -> tuple:
    """Actor-pool sizing for compute stages: autoscaling pools that start at
    1 actor ramp far too slowly to fill the node on a short stage, so the
    floor tracks the cluster's CPU count (measured: min=1 → 24 % core
    utilization on a 30 s stage; min=0.75·cpus → ~3× throughput)."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 8))
            return (max(1, (n * 3) // 4), n)
    except Exception:
        pass
    return (1, 8)


class VerifyImages:
    """Actor-pool stage: decode stored bytes, recompute pHash, check the
    mandated per-row invariant (decoded-pixel allclose / PSNR≥40dB for lossy
    + caption fingerprint) — BASELINE.json input_hint. Stateful setup
    (DCT matrix warm, codec dispatch) happens once per actor."""

    def __init__(self, spec_dict: dict):
        self.spec = C.CorpusSpec(**spec_dict)
        from ..functions.hashing import _dct_matrix

        _dct_matrix(32)  # warm the cached DCT basis

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        fmts = b["fmt"].to_pylist()
        blobs = b["bytes"].to_pylist()
        phs = b["phash"].to_numpy()
        ok_hash = np.zeros(len(ids), dtype=bool)
        roundtrip = np.zeros(len(ids), dtype=bool)
        psnrs = np.zeros(len(ids), dtype=np.float64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            px = decode_image(blob, fmt)
            ok_hash[i] = phash64(px) == phs[i]
            # transcode integrity: re-encoding the decoded pixels must
            # reproduce the stored bytes (lossless for png; the stub lossy
            # codec is idempotent on quantized pixels)
            roundtrip[i] = encode_image(px, fmt) == blob
            if fmt == "png":
                # lossless path: encode is injective (decode∘encode == id),
                # so roundtrip_ok ⟹ decoded == the pixels the builder
                # encoded — pixel-exact, PSNR = inf by construction. Skipping
                # the original-regen halves the stage's memory traffic (the
                # bandwidth wall that capped 4→16 scaling at ~0.6).
                psnrs[i] = float("inf") if roundtrip[i] else 0.0
            else:
                original = C.pixels_of_index(self.spec, int(ids[i][3:]))
                psnrs[i] = psnr(original, px)
        return pa.table(
            {
                "image_id": b["image_id"],
                "fmt": b["fmt"],
                "phash_ok": pa.array(ok_hash, pa.bool_()),
                "roundtrip_ok": pa.array(roundtrip, pa.bool_()),
                "psnr_db": pa.array(psnrs, pa.float64()),
                "psnr_ok": pa.array((psnrs >= 40.0) | np.isinf(psnrs), pa.bool_()),
            }
        )


def verify_images_ds(spec: C.CorpusSpec):
    """read corpus → actor-pool decode/verify — the minimum end-to-end slice
    (SURVEY §7.2): zero-copy Arrow in, small batches for wide binary rows."""
    path = _corpus(spec)
    ds = lt.read_dataset(path, columns=["image_id", "bytes", "fmt", "phash"])
    return ds.map_batches(
        VerifyImages,
        fn_constructor_kwargs={"spec_dict": spec.__dict__.copy()},
        batch_format="pyarrow",
        batch_size=64,  # binary payloads: keep batches small (SURVEY §7.5.7)
        concurrency=_pool(),
    )


def entry_flagship():
    """Driver smoke entry: verify pipeline at sf0.001-ish scale (2k images)."""
    return verify_images_ds(FLAGSHIP_SPEC)


def _spec_for_sf(sf_dir: str) -> C.CorpusSpec:
    # driver passes a testdata sf dir; map it to a corpus size deterministically
    if "0.1" in sf_dir:
        return C.CorpusSpec(n_images=20_000, n_hosts=64, num_buckets=16)
    if "0.01" in sf_dir:
        return C.CorpusSpec(n_images=5_000, n_hosts=32, num_buckets=8)
    return C.CorpusSpec(n_images=1_000, n_hosts=16, num_buckets=4)


def q_image_verify(sf_dir: str) -> pd.DataFrame:
    """per-fmt verification stats of the corpus (rows-only check)."""
    from ray.data.aggregate import Sum

    ds = verify_images_ds(_spec_for_sf(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "fmt": b["fmt"],
                "ok": pa.compute.cast(
                    pa.compute.and_(
                        pa.compute.and_(b["phash_ok"], b["psnr_ok"]), b["roundtrip_ok"]
                    ),
                    pa.int64(),
                ),
            }
        )
        return t.group_by(["fmt"]).aggregate([("ok", "sum"), ([], "count_all")])

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Sum("ok_sum", alias_name="n_ok"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["fmt", "n", "n_ok"]]


# ------------------------------------------------------- crawl-backed queries


def _crawl_params_for_sf(sf_dir: str):
    """Small deterministic crawl per sf tier (ckpt cached under /tmp, keyed
    by the param digest via the root path — repeat queries reuse it)."""
    from ..semantics import CrawlParams

    spec = _spec_for_sf(sf_dir)
    # neardup + binary densities high enough that every page family (html /
    # duplicate / disallowed / binary) shows up in the driver-checked output
    spec = C.CorpusSpec(
        **{**spec.__dict__, "neardup_permille": 150, "binary_permille": 30}
    )
    max_pages = {1_000: 300, 5_000: 800, 20_000: 2_000}.get(spec.n_images, 300)
    return CrawlParams(spec=spec, max_pages=max_pages, politeness=True, politeness_factor=10)


def _crawl_result(sf_dir: str):
    from .crawl import CrawlConfig, run_crawl

    params = _crawl_params_for_sf(sf_dir)
    sp = params.spec
    # key the cached checkpoint by the FULL spec digest — a root reused
    # across spec changes would silently resume a stale crawl (builtin
    # hash() is process-salted, so use a stable md5)
    import hashlib

    tag = hashlib.md5(
        f"{sorted(sp.__dict__.items())}|{params.max_pages}|{params.politeness_factor}".encode()
    ).hexdigest()[:8]
    root = f"{SCRATCH}/q-crawl-n{sp.n_images}-p{params.max_pages}-{tag}"
    corpus = C.build_corpus(sp, C.corpus_path(SCRATCH, sp))
    return run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus), corpus


def q_crawl_pages(sf_dir: str) -> pd.DataFrame:
    """Crawled pages by status (A2 analogue over the engine's own output)."""
    res, _ = _crawl_result(sf_dir)
    pt = res.pages_table().to_pandas()
    out = pt.groupby("status", as_index=False).agg(n=("rank", "count"))
    return out.sort_values("status").reset_index(drop=True)


def q_crawl_order(sf_dir: str) -> pd.DataFrame:
    """First 100 crawled URLs in crawl order — the O1 ordering contract
    (parity vs the sequential oracle is asserted in tests/test_crawl_parity)."""
    res, _ = _crawl_result(sf_dir)
    pt = res.pages_table().to_pandas()
    return pt[["rank", "url", "priority", "seq", "gen"]].head(100)


def q_crawl_frontier_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-generation crawl metrics (A7/monitoring analogue); wall-clock
    columns dropped for determinism."""
    from .crawl import _gd, _gens_of
    from ..sources import lance_table as lt2

    res, _ = _crawl_result(sf_dir)
    rows = [
        lt2.read_pyarrow(_gd(res.root, "metrics", g)).to_pandas()
        for g in _gens_of(res.root, "metrics")
    ]
    df = pd.concat(rows, ignore_index=True).drop(columns=["secs", "stage_secs"])
    return df.sort_values("gen").reset_index(drop=True)


def q_crawl_link_stats(sf_dir: str) -> pd.DataFrame:
    """Link-graph aggregate: edges discovered, distinct targets, distinct
    source pages (A1/A8 analogue over the crawl's link table)."""
    res, _ = _crawl_result(sf_dir)
    link_t = res.links_table().to_pandas()
    return pd.DataFrame(
        {
            "n_links": [len(link_t)],
            "n_distinct_targets": [link_t["url"].nunique() if len(link_t) else 0],
            "n_source_pages": [link_t["from_rank"].nunique() if len(link_t) else 0],
        }
    )


_EXTRACT_REMOTE: dict = {}


def _extract_remote():
    """Module-level remote fns for the M3 ref-extract fan-out, created once
    per Ray session (re-decorating per call would re-export the closure each
    generation). Raw tasks, not a Dataset: the fan-out is a bounded set of
    driver-sliced row ranges — a `from_arrow → repartition → map_batches`
    pipeline paid an all-to-all plus launch (~1.5-2 s/call measured) to move
    the same ≤64 slices."""
    import ray

    key = ray.get_runtime_context().get_job_id()
    hit = _EXTRACT_REMOTE.get(key)
    if hit is None:

        @ray.remote
        def extract_block(ranks, idxs, spec_dict):
            from ieps_crawler_ray.functions.html_clean import extract_image_urls

            sp = C.CorpusSpec(**spec_dict)
            ranks_out, idx_out = [], []
            for r, i in zip(ranks, idxs):
                for u in extract_image_urls(C.page_html_of_index(sp, int(i))):
                    t = C.index_of_img_url(u)
                    if t >= 0:
                        ranks_out.append(int(r))
                        idx_out.append(t)
            return (
                np.asarray(ranks_out, dtype=np.int64),
                np.asarray(idx_out, dtype=np.int64),
            )

        @ray.remote
        def agg_ref_counts(*parts):
            idx = (
                np.concatenate([p[1] for p in parts])
                if parts
                else np.empty(0, np.int64)
            )
            return np.unique(idx, return_counts=True)

        _EXTRACT_REMOTE.clear()  # drop stale-session handles
        hit = _EXTRACT_REMOTE[key] = (extract_block, agg_ref_counts)
    return hit


def _extract_futs(pages_t: pa.Table, spec: C.CorpusSpec) -> list:
    """Dispatch the per-slice extract tasks for the crawled HTML pages."""
    html = pages_t.filter(pa.compute.equal(pages_t["status"], "html")).select(
        ["rank", "idx"]
    )
    if html.num_rows == 0:
        return []
    extract_block, _ = _extract_remote()
    ranks = html["rank"].to_numpy()
    idxs = html["idx"].to_numpy()
    n_blocks = max(1, min(64, html.num_rows // 64))
    bounds = np.linspace(0, html.num_rows, n_blocks + 1).astype(np.int64)
    sd = spec.__dict__.copy()
    return [
        extract_block.remote(ranks[a:b], idxs[a:b], sd)
        for a, b in zip(bounds[:-1], bounds[1:])
        if b > a
    ]


def extract_page_image_refs(pages_t: pa.Table, spec: C.CorpusSpec):
    """M3: image-URL extraction over crawled HTML pages, distributed —
    each page's served HTML is parsed for <img src> tags and CSS url(...)
    refs (crawler.py:447-538; the reference stored 12 600 images for 1 455
    pages). → (rank, img_idx) reference rows."""
    import ray

    futs = _extract_futs(pages_t, spec)
    if not futs:
        return pa.table({"rank": pa.array([], pa.int64()), "img_idx": pa.array([], pa.int64())})
    parts = ray.get(futs)
    return pa.table(
        {
            "rank": pa.array(np.concatenate([p[0] for p in parts]), pa.int64()),
            "img_idx": pa.array(np.concatenate([p[1] for p in parts]), pa.int64()),
        }
    )


def crawl_images_ds(pages_t: pa.Table, spec: C.CorpusSpec, corpus_path: str):
    """Image stage over crawled pages as ONE streaming corpus scan + broadcast
    semi-join: the crawled pages' embedded-image refs (M3, politeness-budget
    bounded — ≤ MAX_IMAGES_PER_PAGE+1 per page) reduce to a distinct id set
    shipped once via ray.put; each corpus block keeps only referenced rows,
    decodes each DISTINCT image once, and carries its reference count.
    No per-task partition reloads, no hot-host skew (corpus fragments are
    (block × partition) sized), block-parallel end to end — the Ray-idiomatic
    replacement for a point-lookup join against a big binary table."""
    import ray

    # the ref-id set is built by raw extract tasks whose AGGREGATE is itself
    # a task: `ref` resolves when extraction finishes, the decode actors
    # block on it in __init__, and the corpus READ tasks stream concurrently
    # — the HTML-parse prefix overlaps the scan instead of serializing
    # ahead of it (measured ~3.5 s serial at 16 cpus before)
    futs = _extract_futs(pages_t, spec)
    if futs:
        _, agg_ref_counts = _extract_remote()
        ref = agg_ref_counts.remote(*futs)
    else:
        ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))
    spec_dict = spec.__dict__.copy()

    class DecodeCrawled:
        def __init__(self):
            self.idxs, self.counts = ray.get(ref)
            self.spec = C.CorpusSpec(**spec_dict)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = np.fromiter(
                (int(s[3:]) for s in b["image_id"].to_pylist()), dtype=np.int64
            )
            pos = np.searchsorted(self.idxs, ids)
            pos = np.minimum(pos, max(len(self.idxs) - 1, 0))
            keep = self.idxs[pos] == ids if len(self.idxs) else np.zeros(len(ids), dtype=bool)
            if not keep.any():
                return _EMPTY_IMAGE_ROWS
            sel = np.flatnonzero(keep)
            sub = b.take(pa.array(sel))
            n = len(sel)
            fmts = sub["fmt"].to_pylist()
            blobs = sub["bytes"].to_pylist()
            phs = sub["phash"].to_numpy()
            sidx = ids[sel]
            ok_hash = np.zeros(n, dtype=bool)
            roundtrip = np.zeros(n, dtype=bool)
            psnr_ok = np.zeros(n, dtype=bool)
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            for i in range(n):
                px = decode_image(blobs[i], fmts[i])
                ok_hash[i] = phash64(px) == phs[i]
                roundtrip[i] = encode_image(px, fmts[i]) == blobs[i]
                if fmts[i] == "png":
                    # lossless: roundtrip_ok proves pixel-exactness (see
                    # VerifyImages) — no original regen needed
                    psnr_ok[i] = roundtrip[i]
                else:
                    p = psnr(C.pixels_of_index(self.spec, int(sidx[i])), px)
                    psnr_ok[i] = p >= 40.0 or np.isinf(p)
                heights[i], widths[i] = px.shape[0], px.shape[1]
            return pa.table(
                {
                    "img_idx": pa.array(sidx, pa.int64()),
                    "n_refs": pa.array(self.counts[pos[sel]], pa.int64()),
                    "fmt": pa.array(fmts, pa.string()),
                    "w": pa.array(widths, pa.int32()),
                    "h": pa.array(heights, pa.int32()),
                    "phash_ok": pa.array(ok_hash, pa.bool_()),
                    "roundtrip_ok": pa.array(roundtrip, pa.bool_()),
                    "psnr_ok": pa.array(psnr_ok, pa.bool_()),
                }
            )

    ds = lt.read_dataset(
        corpus_path, columns=["image_id", "bytes", "fmt", "phash"]
    )
    return ds.map_batches(
        DecodeCrawled, batch_format="pyarrow", batch_size=64, concurrency=_pool()
    )


_EMPTY_IMAGE_ROWS = pa.table(
    {
        "img_idx": pa.array([], pa.int64()),
        "n_refs": pa.array([], pa.int64()),
        "fmt": pa.array([], pa.string()),
        "w": pa.array([], pa.int32()),
        "h": pa.array([], pa.int32()),
        "phash_ok": pa.array([], pa.bool_()),
        "roundtrip_ok": pa.array([], pa.bool_()),
        "psnr_ok": pa.array([], pa.bool_()),
    }
)


def q_crawl_images_verify(sf_dir: str) -> pd.DataFrame:
    """Images embedded in crawled (non-dup HTML) pages — M3 extraction, then
    decode + verify per-fmt (the BASELINE.json input_hint per-row invariant
    over the crawl output). n_refs_total > n_pages by construction (avg
    ≈ 8.5 images/page, matching the reference's density)."""
    from ray.data.aggregate import Sum

    res, corpus = _crawl_result(sf_dir)
    params = _crawl_params_for_sf(sf_dir)
    ds = crawl_images_ds(res.pages_table(), params.spec, corpus)

    # per-fmt PARTIAL agg inside each batch (pyarrow C++ group_by), then a
    # tiny per-fmt groupby — only partial rows ever shuffle or reach the
    # driver (at scale the per-image stat rows are the whole corpus)
    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "fmt": b["fmt"],
                "n_refs": b["n_refs"],
                "phash_ok": pa.compute.cast(b["phash_ok"], pa.int64()),
                "roundtrip_ok": pa.compute.cast(b["roundtrip_ok"], pa.int64()),
                "psnr_ok": pa.compute.cast(b["psnr_ok"], pa.int64()),
            }
        )
        return t.group_by(["fmt"]).aggregate(
            [
                ([], "count_all"),
                ("n_refs", "sum"),
                ("phash_ok", "sum"),
                ("roundtrip_ok", "sum"),
                ("psnr_ok", "sum"),
            ]
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("count_all", alias_name="n_images"),
            Sum("n_refs_sum", alias_name="n_refs_total"),
            Sum("phash_ok_sum", alias_name="n_phash_ok"),
            Sum("roundtrip_ok_sum", alias_name="n_roundtrip_ok"),
            Sum("psnr_ok_sum", alias_name="n_psnr_ok"),
        )
        .to_pandas()
    )
    out = out[
        ["fmt", "n_images", "n_refs_total", "n_phash_ok", "n_roundtrip_ok", "n_psnr_ok"]
    ]
    cols = ["n_images", "n_refs_total", "n_phash_ok", "n_roundtrip_ok", "n_psnr_ok"]
    out[cols] = out[cols].astype(int)
    return out.sort_values("fmt").reset_index(drop=True)


def q_crawl_sitemap_stats(sf_dir: str) -> pd.DataFrame:
    """S4 channel end-to-end: re-run the tier crawl with sitemap injection ON
    and report how many crawled pages arrived via sitemap discovery (seq slot
    >= SITEMAP_LINK_BASE) vs links/seeds, plus hosts that announced sitemaps.
    Parity of the full ordering is asserted in tests/test_crawl_parity.py."""
    from .crawl import CrawlConfig, run_crawl
    from ..semantics import SEQ_SHIFT, SITEMAP_LINK_BASE

    params = _crawl_params_for_sf(sf_dir)
    params = type(params)(**{**params.__dict__, "sitemaps": True})
    sp = params.spec
    root = f"{SCRATCH}/q-crawl-sm-n{sp.n_images}-p{params.max_pages}"
    corpus = C.build_corpus(sp, C.corpus_path(SCRATCH, sp))
    res = run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus)
    pt = res.pages_table().to_pandas()
    link_idx = pt["seq"].to_numpy() & ((1 << SEQ_SHIFT) - 1)
    via_sitemap = ((link_idx >= SITEMAP_LINK_BASE) & (pt["gen"] > 1)).sum()
    n_sm_hosts = sum(
        1 for h in range(sp.n_hosts) if C.sitemap_urls_for_host(sp, h)
    )
    return pd.DataFrame(
        {
            "n_pages": [len(pt)],
            "n_via_sitemap": [int(via_sitemap)],
            "n_hosts_with_sitemap": [n_sm_hosts],
        }
    )


def q_crawl_audit(sf_dir: str) -> pd.DataFrame:
    """Acceptance audit of the tier crawl's checkpoint — the
    test/validate_crawler.py:32-47 run_all_checks analogue as a driver query:
    one row per check (page counts, html-content coverage, dedup-index
    coverage, binary codes, duplicate invariants, links, robots compliance,
    politeness budgets, lineage completeness), all expected to pass."""
    from .audit import run_all_checks

    res, _ = _crawl_result(sf_dir)
    params = _crawl_params_for_sf(sf_dir)
    rows = run_all_checks(
        res.root,
        params.spec,
        politeness_factor=params.politeness_factor,
        min_pages=params.max_pages,
    )
    return pd.DataFrame(rows)[["check", "passed", "detail"]]


class ThumbnailImages:
    """Actor-pool resize stage (the brief's multimodal resize op): decode →
    block-mean 32×32 thumbnail → luma + checksum per image. Decode/resize
    dispatch state warms once per actor; batches stay small because the input
    rows carry the full binary payload."""

    def __init__(self):
        from ..functions.hashing import _dct_matrix

        _dct_matrix(32)  # shared warm-up path with the verify stage

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib

        from ..functions.media import resize_block_mean

        fmts = b["fmt"].to_pylist()
        blobs = b["bytes"].to_pylist()
        luma = np.zeros(len(blobs), dtype=np.int64)
        check = np.zeros(len(blobs), dtype=np.int64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            thumb = resize_block_mean(decode_image(blob, fmt), 32, 32)
            luma[i] = int(thumb.mean())
            check[i] = int(hashlib.md5(thumb.tobytes()).hexdigest()[:12], 16)
        t = pa.table(
            {
                "fmt": b["fmt"],
                "one": pa.array(np.ones(len(blobs), np.int64)),
                "luma": pa.array(luma),
                "check": pa.array(check),
            }
        )
        return t.group_by(["fmt"]).aggregate(
            [("one", "sum"), ("luma", "sum"), ("check", "sum")]
        )


def q_image_thumbnails(sf_dir: str) -> pd.DataFrame:
    """corpus → actor-pool decode+resize → per-fmt thumbnail stats (n, mean
    luma sum, order-independent checksum). Rows-only for the driver;
    golden-pinned at sf0.001 in tests/test_golden_values.py."""
    from ray.data.aggregate import Sum

    spec = _spec_for_sf(sf_dir)
    path = _corpus(spec)
    ds = lt.read_dataset(path, columns=["image_id", "bytes", "fmt"])
    out = (
        ds.map_batches(
            ThumbnailImages,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=_pool(),
        )
        .groupby("fmt")
        .aggregate(
            Sum("one_sum", alias_name="n"),
            Sum("luma_sum", alias_name="luma_total"),
            Sum("check_sum", alias_name="thumb_check"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    return out[["fmt", "n", "luma_total", "thumb_check"]]


def _host_edge_weights(spec) -> pd.DataFrame:
    """Weighted host→host edge table, host²-bounded: page→page links are
    generated and folded to (h_src, h_dst, w) partials INSIDE map_batches,
    so the shuffle moves at most n_hosts² × n_batches partial rows and the
    page-level edge list never leaves the cluster. Shared by
    q_host_pagerank and q_host_hits."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    nh = spec.n_hosts

    def edge_partials(b: pa.Table) -> pa.Table:
        idxs = b["id"].to_numpy()
        src, _jj, tgt, _anchors = C.out_links_batch(spec, idxs)
        hs = C.host_of_index(spec, src).astype(np.int64)
        hd = C.host_of_index(spec, tgt).astype(np.int64)
        keys, w = np.unique(hs * nh + hd, return_counts=True)
        return pa.table(
            {
                "h_src": pa.array(keys // nh),
                "h_dst": pa.array(keys % nh),
                "w": pa.array(w.astype(np.int64)),
            }
        )

    return (
        rd.range(spec.n_images)
        .map_batches(edge_partials, batch_format="pyarrow")
        .groupby(["h_src", "h_dst"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )


def q_host_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the corpus link graph, aggregated to host level — the
    iterative-graph-algorithm shape (no SQL oracle; deterministic, golden-
    pinned in tests/test_golden_values.py, plus an independent dense-matrix
    recomputation check in tests/test_wave3.py).

    Scale plan: the page→page edge list (n_pages × ~7.5 links) never leaves
    the cluster — edges are generated and folded to weighted host→host
    partial counts INSIDE map_batches, so the shuffle moves at most
    n_hosts² × n_batches partial rows. The rank vector is host-sized
    (result-sized by construction, like a groupby result), so the power
    iteration runs on the driver over the aggregated matrix; at web scale
    (10⁸ hosts) the same plan swaps the driver loop for a per-iteration
    broadcast-ranks + edges-map_batches + groupby(dst) sum, which this code
    path is shaped to become (edges stay a Dataset until the final fold)."""
    spec = _spec_for_sf(sf_dir)
    nh = spec.n_hosts
    edges = _host_edge_weights(spec)
    hs = edges["h_src"].to_numpy()
    hd = edges["h_dst"].to_numpy()
    w = edges["w"].to_numpy().astype(np.float64)
    out_w = np.zeros(nh)
    np.add.at(out_w, hs, w)
    damping, rank = 0.85, np.full(nh, 1.0 / nh)
    for _ in range(20):
        contrib = np.zeros(nh)
        np.add.at(contrib, hd, w * rank[hs] / out_w[hs])
        dangling = rank[out_w == 0].sum()
        rank = (1 - damping) / nh + damping * (contrib + dangling / nh)
    out = pd.DataFrame({"host": np.arange(nh, dtype=np.int64), "rank": rank.round(8)})
    return (
        out.sort_values(["rank", "host"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_host_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs-and-authorities over the host link graph (Kleinberg's
    public formulation: a = Wᵀh, h = Wa, L2-normalize each, 20 rounds) —
    the query-independent twin of q_host_pagerank, sharing its ONE
    distributed edge aggregation (`_host_edge_weights`, host²-bounded
    shuffle); the power iteration runs driver-side on the host-dimension-
    bounded weight matrix, the same scale plan as pagerank. Top-10 hosts
    by authority (tie → host asc). No SQL oracle (iterative); golden-
    pinned + dense numpy recompute in tests/test_round5.py."""
    spec = _spec_for_sf(sf_dir)
    nh = spec.n_hosts
    edges = _host_edge_weights(spec)
    hs = edges["h_src"].to_numpy()
    hd = edges["h_dst"].to_numpy()
    w = edges["w"].to_numpy().astype(np.float64)
    auth = np.full(nh, 1.0 / np.sqrt(nh))
    hub = np.full(nh, 1.0 / np.sqrt(nh))
    for _ in range(20):
        auth = np.zeros(nh)
        np.add.at(auth, hd, w * hub[hs])
        auth /= max(np.linalg.norm(auth), 1e-300)
        hub = np.zeros(nh)
        np.add.at(hub, hs, w * auth[hd])
        hub /= max(np.linalg.norm(hub), 1e-300)
    out = pd.DataFrame(
        {
            "host": np.arange(nh, dtype=np.int64),
            "authority": auth.round(8),
            "hub": hub.round(8),
        }
    )
    return (
        out.sort_values(["authority", "host"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_host_closeness(sf_dir: str) -> pd.DataFrame:
    """Harmonic closeness centrality over the directed host link graph:
    C(u) = sum over reachable v != u of 1/d(u, v) (the disconnected-safe
    closeness variant) — completes the host-graph family (pagerank, HITS)
    with a distance-based score. Shares the ONE distributed edge fold
    (`_host_edge_weights`, host^2-bounded shuffle); the all-sources BFS runs
    driver-side on the host-dimension-bounded boolean adjacency (levelwise
    numpy frontier sweeps, no per-page work — the same result-sized-graph
    placement argument as pagerank/HITS). Top-10 by centrality (tie -> host
    asc). No SQL oracle (iterative); golden-pinned + dense recompute in
    tests/test_round5.py."""
    spec = _spec_for_sf(sf_dir)
    nh = spec.n_hosts
    edges = _host_edge_weights(spec)
    adj = np.zeros((nh, nh), dtype=bool)
    adj[edges["h_src"].to_numpy(), edges["h_dst"].to_numpy()] = True
    cent = np.zeros(nh)
    for s in range(nh):
        dist = np.full(nh, -1, np.int64)
        dist[s] = 0
        frontier = np.zeros(nh, dtype=bool)
        frontier[s] = True
        d = 0
        while frontier.any():
            d += 1
            nxt = adj[frontier].any(axis=0) & (dist < 0)
            dist[nxt] = d
            frontier = nxt
        reach = dist > 0
        cent[s] = float((1.0 / dist[reach]).sum())
    out = pd.DataFrame(
        {"host": np.arange(nh, dtype=np.int64), "closeness": cent.round(8)}
    )
    return (
        out.sort_values(["closeness", "host"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def q_image_phash_neardup(sf_dir: str) -> pd.DataFrame:
    """Image-level near-duplicate PAIRS (pHash hamming ≤ 3) via banded LSH —
    the image-modality twin of ``q_simhash_neardup_pairs``: 4 bands × 16
    bits of the stored 64-bit pHash, pigeonhole-exact for the threshold
    (≤ 3 differing bits leave ≥ 1 band equal), so candidate generation is a
    bucket groupby over band keys, never all-pairs; exact popcount verify
    runs vectorized inside each band bucket and cross-band duplicates
    collapse through a fixed-count pair-hash bucket. The corpus plants
    ``dup_image_permille`` perturbed copies (reference analogue: the image
    duplicate handling of oldstufffrompa1/crawler.py:437-541 recast as
    corpus-wide near-dup mining). Reads ONLY (image_id, phash) — the binary
    payload never leaves storage. Golden-pinned; brute-force-equality
    pytest."""
    spec = _spec_for_sf(sf_dir)
    spec = C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})
    path = _corpus(spec)
    ds = lt.read_dataset(path, columns=["image_id", "phash"])
    T = 3

    def band_f(b: pa.Table) -> pa.Table:
        ids = np.array(
            [int(s[3:]) for s in b["image_id"].to_pylist()], dtype=np.int64
        )
        h = b["phash"].to_numpy().view(np.uint64)
        keys = np.concatenate(
            [
                np.int64(k) * np.int64(1 << 16)
                + ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
                for k in range(4)
            ]
        )
        return pa.table(
            {
                "bk_key": pa.array(keys, pa.int64()),
                "img": pa.array(np.tile(ids, 4), pa.int64()),
                "phash": pa.array(np.tile(h.view(np.int64), 4), pa.int64()),
            }
        )

    from ..functions.hashing import capped_band_pairs

    # band-bucket flood guard, ON by default (unlike the opt-in simhash
    # twin): a degenerate pHash — solid-color / uniform images all hashing
    # alike — can put O(corpus) rows in one band bucket; the cap bounds
    # in-bucket compares at O(cap·run) while min-id winners (the keep rule
    # of clusters/manifest downstream) stay linked. 0 disables (exact).
    CAP = int(os.environ.get("IEPS_PHASH_BAND_CAP", "4096") or 0)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["img"].to_numpy()
        ph = g["phash"].to_numpy()
        a, b, ham = capped_band_pairs(ids, ph, T, CAP)
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": ham}).astype(
            {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
        )

    N_PB = 64

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    out = (
        ds.map_batches(band_f, batch_format="pyarrow")
        .groupby("bk_key")
        .map_groups(emit, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "hamming"]],
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _phash_component_labels(edges: pd.DataFrame) -> dict[int, int]:
    """node → component min-id over the verified pHash pair graph. Driver
    union-find while the dup-rate-bounded edge list fits one process;
    at/above IEPS_IMG_LABELPROP_MIN_EDGES edges the distributed hash-min
    label propagation (`analytics._labelprop_min_labels` — per-round join
    + Min-reduce over a Dataset) takes over, the same growth path the
    triangle count's pair-keyed fallback uses. Both return min-id labels,
    so downstream cluster ids/manifests are path-invariant (asserted in
    tests/test_round5.py)."""
    thr = int(os.environ.get("IEPS_IMG_LABELPROP_MIN_EDGES", "2000000") or 0)
    if thr and len(edges) >= thr:
        from .analytics import _labelprop_min_labels

        lab = _labelprop_min_labels(edges[["id_a", "id_b"]])
        return dict(zip(lab["node"].astype(int), lab["label"].astype(int)))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = set(edges["id_a"].astype(int)) | set(edges["id_b"].astype(int))
    return {n: find(n) for n in nodes}


def q_image_phash_clusters(sf_dir: str) -> pd.DataFrame:
    """Image near-duplicate CLUSTERS: connected components over the verified
    pHash hamming≤3 pair graph (q_image_phash_neardup — banded LSH, never
    all-pairs), each non-singleton component labeled with its min image id
    — the keep-one-per-cluster unit an image-dedup pass drops against
    (SemDeDup/CC-pipeline analogue for the image modality; reference
    analogue: the MinHash duplicate handling of oldstufffrompa1/
    crawler.py:366-410 applied to images). Output is per-CLUSTER (cluster
    id, member count, max in-cluster pair hamming) — result-sized, so no
    full image-id column ships to the driver; the component resolution is
    `_phash_component_labels` — driver union-find over the dup-rate-
    bounded EDGE set (≪ corpus) below IEPS_IMG_LABELPROP_MIN_EDGES,
    distributed hash-min label propagation above it (both min-id-labeled,
    path-invariant). Golden-pinned; brute-force recompute in
    tests/test_wave14.py; forced-labelprop parity in tests/test_round5.py."""
    edges = q_image_phash_neardup(sf_dir)
    label = _phash_component_labels(edges)
    rows: dict[int, list] = {}
    for (a, b, h) in zip(edges["id_a"], edges["id_b"], edges["hamming"]):
        r = label[int(a)]
        e = rows.setdefault(r, [set(), 0])
        e[0].update((int(a), int(b)))
        e[1] = max(e[1], int(h))
    out = pd.DataFrame(
        {
            "cluster_id": sorted(rows),
            "n_images": [len(rows[r][0]) for r in sorted(rows)],
            "max_hamming": [rows[r][1] for r in sorted(rows)],
        }
    )
    return out.astype({"cluster_id": "int64", "n_images": "int64", "max_hamming": "int64"})


def q_image_dedup_manifest(sf_dir: str) -> pd.DataFrame:
    """The ACTIONABLE output of image near-dedup at 100 TB: per-fmt
    keep/drop manifest totals from the pHash cluster graph — each cluster
    keeps its min-id member (first-wins, the reference's duplicate
    arbitration in oldstufffrompa1/crawler.py:366-410), everything else is
    dropped; reports images, drops and DECODED-pixel bytes reclaimed
    (w×h×3 — the cost a training pipeline actually pays; the stored binary
    column itself never leaves storage). Scale plan: the drop SET is
    dup-rate-bounded (≈ dup_image_permille of the corpus), so it broadcasts
    to one np.isin per batch of a single (image_id, fmt, w, h) corpus scan;
    cluster resolution reuses `_phash_component_labels` (union-find below
    the edge threshold, distributed labelprop above). Golden-pinned;
    recompute test in tests/test_wave15.py."""
    edges = q_image_phash_neardup(sf_dir)
    label = _phash_component_labels(edges)
    members: dict[int, set] = {}
    for a in set(edges["id_a"]) | set(edges["id_b"]):
        members.setdefault(label[int(a)], set()).add(int(a))
    drop = np.array(
        sorted(m for r, ms in members.items() for m in ms if m != min(ms)),
        dtype=np.int64,
    )

    spec = _spec_for_sf(sf_dir)
    spec = C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})
    ds = lt.read_dataset(_corpus(spec), columns=["image_id", "fmt", "w", "h"])

    def fold(b: pa.Table) -> pa.Table:
        ids = np.array([int(s[3:]) for s in b["image_id"].to_pylist()], np.int64)
        dropped = np.isin(ids, drop)
        px = (
            b["w"].to_numpy().astype(np.int64)
            * b["h"].to_numpy().astype(np.int64)
            * 3
        )
        t = pa.table(
            {
                "fmt": b["fmt"],
                "one": pa.array(np.ones(len(ids), np.int64)),
                "dropped": pa.array(dropped.astype(np.int64)),
                "px_saved": pa.array(np.where(dropped, px, 0)),
            }
        )
        return t.group_by(["fmt"]).aggregate(
            [("one", "sum"), ("dropped", "sum"), ("px_saved", "sum")]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("one_sum", alias_name="n_images"),
            Sum("dropped_sum", alias_name="n_dropped"),
            Sum("px_saved_sum", alias_name="px_bytes_saved"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_images": "int64", "n_dropped": "int64", "px_bytes_saved": "int64"}
    )[["fmt", "n_images", "n_dropped", "px_bytes_saved"]]


def q_caption_image_consistency(sf_dir: str) -> pd.DataFrame:
    """Cross-modal consistency mining: caption near-duplicate PAIRS
    (word-set MinHash-LSH, exact Jaccard ≥ 0.8 verify) annotated with the
    pHash hamming distance of their IMAGES — the contrastive-pair /
    label-noise miner of an image+caption curation pipeline ("same text,
    different picture" pairs are either augmentation gold or alignment
    noise; reference analogue: the caption MinHash semantics of
    Estrella.py:580-603 applied to the Lance image table). The corpus
    plants ~2% one-word-edit captions (corpus.py caption_of_index), so the
    miner has real signal. Scale plan: banded LSH (50×4) bounds candidates,
    a fixed-count pair-hash bucket dedups cross-band repeats; the deduped
    candidate list is dup-rate-bounded (≈2% of the corpus), so it collects
    driver-side (same bound as the union-find edge lists) and ONE extra
    corpus scan with a broadcast sorted-id membership test ships back only
    the ≤2·|pairs| touched (caption, phash) rows for a vectorized verify —
    never all-pairs, never a corpus broadcast, and the binary payload
    column never leaves storage. If dup rate ever outgrows the driver, the
    hash-join-per-side shape used by q_docs_jaccard_pairs is the drop-in
    growth path. Golden-pinned; brute-force-equality pytest in
    tests/test_wave15.py."""
    from ..functions.hashing import MinHasher, hamming64

    spec = _spec_for_sf(sf_dir)
    path = _corpus(spec)
    ds = lt.read_dataset(path, columns=["image_id", "caption", "phash"])
    mh = MinHasher(num_perms=200, seed=7_042)
    THETA = 0.8

    def band_rows(b: pa.Table) -> pa.Table:
        ids = np.array([int(s[3:]) for s in b["image_id"].to_pylist()], dtype=np.int64)
        toks = [sorted(set(c.split())) for c in b["caption"].to_pylist()]
        keys = mh.band_keys(mh.signatures(toks), bands=50)
        n, nb = keys.shape
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.uint64()),
                "img": pa.array(np.repeat(ids, nb), pa.int64()),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["img"].unique())
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    N_PB = 64

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(emit_pairs, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]],
            batch_format="pandas",
        )
    )

    pairs = cand.to_pandas()  # dup-rate-bounded (≈2% of corpus)
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
            "phash_hamming": pd.Series([], dtype="int64"),
        }
    )
    if len(pairs) == 0:
        return empty
    need = np.unique(
        np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()])
    )  # sorted — one searchsorted membership test per batch
    need_ref = ray.put(need)

    def pick(b: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        ids = np.array([int(s[3:]) for s in b["image_id"].to_pylist()], np.int64)
        pos = np.searchsorted(want, ids)
        hit = (pos < len(want)) & (want[np.minimum(pos, len(want) - 1)] == ids)
        return pa.table(
            {
                "iid": pa.array(ids[hit]),
                "caption": b["caption"].filter(pa.array(hit)),
                "phash": b["phash"].filter(pa.array(hit)),
            }
        )

    side = (
        lt.read_dataset(path, columns=["image_id", "caption", "phash"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .set_index("iid")
    )  # ≤ 2·|pairs| rows
    cap = side["caption"]
    ph = side["phash"].to_numpy().view(np.uint64)
    a_pos = side.index.get_indexer(pairs["id_a"].to_numpy())
    b_pos = side.index.get_indexer(pairs["id_b"].to_numpy())
    jac = np.array(
        [
            len(sa := set(cap.iloc[i].split())) and len(sb := set(cap.iloc[j].split()))
            and len(sa & sb) / len(sa | sb)
            for i, j in zip(a_pos, b_pos)
        ],
        dtype=np.float64,
    )
    ham = hamming64(ph[a_pos], ph[b_pos]).astype(np.int64)
    keep = jac >= THETA
    out = pd.DataFrame(
        {
            "id_a": pairs["id_a"].to_numpy()[keep],
            "id_b": pairs["id_b"].to_numpy()[keep],
            "jaccard": np.round(jac[keep], 4),
            "phash_hamming": ham[keep],
        }
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)




class PixelStats:
    """Actor-pool stage: decode stored bytes and fold per-format LUMA moment
    partials (n_images, n_pixels, Σluma, Σluma²) — the decoded-pixel
    statistics pass of an image-curation pipeline (normalization constants,
    brightness QA). Mergeable moments ARE the shuffle payload: each batch
    emits ≤|fmts| rows regardless of batch size."""

    def __init__(self):
        from ..functions.hashing import _dct_matrix

        _dct_matrix(32)  # codec warm, same as VerifyImages

    def __call__(self, b: pa.Table) -> pa.Table:
        fmts = b["fmt"].to_pylist()
        blobs = b["bytes"].to_pylist()
        agg: dict[str, list] = {}
        for fmt, blob in zip(fmts, blobs):
            px = decode_image(blob, fmt)  # (h, w, 3) uint8
            luma = (
                0.299 * px[:, :, 0].astype(np.float64)
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
            e = agg.setdefault(fmt, [0, 0, 0.0, 0.0])
            e[0] += 1
            e[1] += luma.size
            e[2] += float(luma.sum())
            e[3] += float((luma * luma).sum())
        ks = sorted(agg)
        return pa.table(
            {
                "fmt": pa.array(ks, pa.string()),
                "n_images": pa.array([agg[k][0] for k in ks], pa.int64()),
                "n_pixels": pa.array([agg[k][1] for k in ks], pa.int64()),
                "s1": pa.array([agg[k][2] for k in ks], pa.float64()),
                "s2": pa.array([agg[k][3] for k in ks], pa.float64()),
            }
        )


def q_image_pixel_stats(sf_dir: str) -> pd.DataFrame:
    """Per-format decoded-pixel luma mean/std over the corpus — actor-pool
    decode (setup once per actor), per-batch moment partials, tiny keyed
    groupby. Golden-pinned; numpy recompute in tests/test_wave18.py."""
    from ray.data.aggregate import Sum

    spec = _spec_for_sf(sf_dir)
    ds = lt.read_dataset(_corpus(spec), columns=["fmt", "bytes"])
    out = (
        ds.map_batches(
            PixelStats,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=_pool(),
        )
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_pixels", alias_name="n_pixels"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )
    mean = out["s1"] / out["n_pixels"]
    var = out["s2"] / out["n_pixels"] - mean**2
    out["mean_luma"] = mean.round(4)
    out["std_luma"] = np.sqrt(np.maximum(var, 0.0)).round(4)
    return out[["fmt", "n_images", "n_pixels", "mean_luma", "std_luma"]]


def q_phash_hamming_histogram(sf_dir: str) -> pd.DataFrame:
    """Distribution of pHash hamming distances among banded-LSH CANDIDATE
    pairs — the dedup-threshold diagnostic (how separated are planted
    near-dups from background collisions). Reuses the q_image_phash_neardup
    candidate machinery with the verify threshold lifted to the full band
    guarantee-free range: per band-bucket vectorized popcount, pair-hash
    bucket dedup, then a ≤65-row histogram. Reads only (image_id, phash)."""
    from ray.data.aggregate import Sum

    spec = _spec_for_sf(sf_dir)
    spec = C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})
    ds = lt.read_dataset(_corpus(spec), columns=["image_id", "phash"])

    def band_f(b: pa.Table) -> pa.Table:
        ids = np.array([int(s[3:]) for s in b["image_id"].to_pylist()], dtype=np.int64)
        h = b["phash"].to_numpy().view(np.uint64)
        keys = np.concatenate(
            [
                np.int64(k) * np.int64(1 << 16)
                + ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
                for k in range(4)
            ]
        )
        return pa.table(
            {
                "bk_key": pa.array(keys, pa.int64()),
                "img": pa.array(np.tile(ids, 4), pa.int64()),
                "phash": pa.array(np.tile(h.view(np.int64), 4), pa.int64()),
            }
        )

    from ..functions.hashing import hamming64

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("img")
        ids = g["img"].to_numpy()
        ph = g["phash"].to_numpy().view(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hamming64(ph[ia], ph[ib]).astype(np.int64)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "hamming": ham})

    N_PB = 64

    def add_pb(b: pa.Table) -> pa.Table:
        key = b["id_a"].to_numpy().astype(np.uint64) * np.uint64(1_000_003) + b[
            "id_b"
        ].to_numpy().astype(np.uint64)
        return b.append_column("pb", pa.array((key % np.uint64(N_PB)).astype(np.int32)))

    def hist_seg(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["id_a", "id_b"])
        vc = d["hamming"].value_counts()
        return pd.DataFrame(
            {"hamming": vc.index.to_numpy().astype(np.int64), "n_pairs": vc.to_numpy()}
        )

    out = (
        ds.map_batches(band_f, batch_format="pyarrow")
        .groupby("bk_key")
        .map_groups(emit, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(hist_seg, batch_format="pandas")
        .groupby("hamming")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()
        .sort_values("hamming")
        .reset_index(drop=True)
    )
    return out.astype({"hamming": "int64", "n_pairs": "int64"})


QUERIES = {
    "image_verify": q_image_verify,
    "caption_image_consistency": q_caption_image_consistency,
    "image_dedup_manifest": q_image_dedup_manifest,
    "image_phash_neardup": q_image_phash_neardup,
    "image_phash_clusters": q_image_phash_clusters,
    "host_pagerank": q_host_pagerank,
    "host_hits": q_host_hits,
    "host_closeness": q_host_closeness,
    "image_thumbnails": q_image_thumbnails,
    "crawl_audit": q_crawl_audit,
    "crawl_pages": q_crawl_pages,
    "crawl_order": q_crawl_order,
    "crawl_frontier_metrics": q_crawl_frontier_metrics,
    "crawl_link_stats": q_crawl_link_stats,
    "crawl_images_verify": q_crawl_images_verify,
    "crawl_sitemap_stats": q_crawl_sitemap_stats,
    "image_pixel_stats": q_image_pixel_stats,
    "phash_hamming_histogram": q_phash_hamming_histogram,
}

"""Deterministic synthetic image+caption corpus — the "web" in this sandbox.

BASELINE.json mandates the input table shape
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string, caption:string,
phash:int64)``; no external data exists, so the corpus is synthesized from a
seed. Every attribute of image ``i`` — pixels, caption, host, out-links,
robots rules — is a **pure counter-based function of (spec, i)** (splitmix64
streams), so:

  * generation runs as a Ray pipeline (``range(n) → map_batches``) with no
    cross-partition state and scales to any n,
  * the fetch actors can "fetch" any URL by recomputing / reading only their
    partition,
  * the single-threaded oracle (oracle.py) sees the *identical* web graph
    without sharing code paths with the engine's execution.

Web-graph shape (mirrors what the reference crawls, SURVEY §1.2/§7):
  * hosts own **contiguous index ranges with Zipf-distributed sizes** →
    hot-host skew (host0 is the giant domain, like the reference's single-site
    crawl) that the engine must salt/split (north_rule).
  * URL: ``http://host{h}.example/p{i%100:02d}/img{i:08d}`` — the ``p``
    segment gives robots prefix rules uniform coverage at every scale.
  * out-links of page i: 3–12 links, ~80 % same-host — a seeded function of i.
  * ~2 % of captions are 1-word edits of an earlier caption (MinHash near-dup
    targets, per FIXTURES.md §1); exact duplicates arise when two pages link
    to the same image id.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.codecs import decode_image, encode_image
from ..functions.hashing import U64, mix2, phash64, splitmix64

# a small public-word vocabulary (data-engine flavored, overlaps the testdata
# documents wordlist) — captions and anchor texts draw from it.
WORDLIST = (
    "table row scan query value part hash merge batch spark vector filter "
    "window order data column agg join small line customer key group big "
    "slow fast the a index sort shuffle block store cache read write plan "
    "stage task node disk memory stream page frame image pixel caption "
    "crawl frontier link host fetch robots delay seed rank score near dup"
).split()

DEFAULT_KEYWORDS = ("vector", "image", "frontier")

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


@dataclass(frozen=True)
class CorpusSpec:
    n_images: int
    n_hosts: int = 16
    seed: int = 42
    num_buckets: int = 8        # host-affine partition count (fetch routing)
    zipf_s: float = 1.1         # host-size skew exponent
    neardup_permille: int = 20  # ~2% near-dup captions
    keywords: tuple = DEFAULT_KEYWORDS
    dim_choices: tuple = (32, 64, 128)  # image side lengths (multiples of 32)
    binary_permille: int = 0    # fraction of URLs serving a binary document
    # (M5 BINARY page type; 0 keeps the corpus all-HTML)
    dup_image_permille: int = 0  # ~x/1000 of images are a light pixel
    # perturbation of an earlier image (same dims) — planted signal for
    # image-level near-duplicate detection (pHash hamming pairs); 0 keeps
    # every image visually distinct (and existing corpus caches valid)

    def stream(self, idx, tag) -> np.ndarray:
        """Independent uint64 stream per (image index, tag); tag may be an
        int or an array broadcastable against idx."""
        idx = np.asarray(idx, dtype=np.uint64)
        tag = np.asarray(tag, dtype=np.uint64)
        return mix2(mix2(idx, U64(self.seed)), tag)


# ------------------------------------------------------------- host layout --


def host_boundaries(spec: CorpusSpec) -> np.ndarray:
    """(n_hosts+1,) index boundaries; host k owns [b[k], b[k+1])."""
    k = np.arange(1, spec.n_hosts + 1, dtype=np.float64)
    weights = 1.0 / k**spec.zipf_s
    sizes = np.floor(weights / weights.sum() * spec.n_images).astype(np.int64)
    sizes = np.maximum(sizes, 1)
    # fix rounding drift onto the largest host
    sizes[0] += spec.n_images - sizes.sum()
    b = np.zeros(spec.n_hosts + 1, dtype=np.int64)
    np.cumsum(sizes, out=b[1:])
    return b


def host_of_index(spec: CorpusSpec, idx) -> np.ndarray:
    b = host_boundaries(spec)
    return (np.searchsorted(b, np.asarray(idx, dtype=np.int64), side="right") - 1).astype(np.int32)


def bucket_of_host(spec: CorpusSpec, host_ids) -> np.ndarray:
    """Base host→partition routing (hot hosts additionally salted in crawl.py)."""
    h = np.asarray(host_ids, dtype=np.uint64)
    return (splitmix64(h + U64(spec.seed * 7919)) % U64(spec.num_buckets)).astype(np.int32)


# ---------------------------------------------------------------- identity --

_URL_RE = re.compile(r"^http://host(\d+)\.example/p\d{2}/img(\d{8})$")


def image_id_of_index(i: int) -> str:
    return f"img{i:08d}"


def url_of_index(spec: CorpusSpec, idx) -> list[str]:
    hosts = host_of_index(spec, idx)
    return [
        f"http://host{h}.example/p{int(i) % 100:02d}/img{int(i):08d}"
        for i, h in zip(np.asarray(idx), hosts)
    ]


def index_of_url(url: str) -> int:
    """Inverse of url_of_index (canonical URLs only); -1 if not a corpus URL."""
    m = _URL_RE.match(url)
    return int(m.group(2)) if m else -1


def indices_of_urls(urls) -> np.ndarray:
    return np.fromiter((index_of_url(u) for u in urls), dtype=np.int64, count=len(urls))


# ----------------------------------------------------------------- content --

def dims_of_index(spec: CorpusSpec, idx) -> tuple[np.ndarray, np.ndarray]:
    dims = np.asarray(spec.dim_choices, dtype=np.int32)
    w = dims[(spec.stream(idx, 1) % U64(len(dims))).astype(np.int64)]
    h = dims[(spec.stream(idx, 2) % U64(len(dims))).astype(np.int64)]
    return w, h


def fmt_of_index(spec: CorpusSpec, idx) -> np.ndarray:
    return np.where(spec.stream(idx, 3) % U64(2) == 0, "png", "jpeg")


# content-type each URL's server answers with (M5): text/html for pages,
# one of the 15 binary mimetypes (crawler.py:543-569) for binary documents
_BINARY_CT_CYCLE = (
    "application/pdf",
    "application/msword",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.ms-powerpoint",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "application/vnd.ms-excel",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "application/zip",
    "application/x-rar",
    "application/octet-stream",
    "application/x-7z-compressed",
    "application/x-tar",
    "application/x-pdf",
    "image/tiff",
)


def content_type_of_index(spec: CorpusSpec, idx) -> list[str]:
    idx = np.asarray(idx, dtype=np.int64)
    if not spec.binary_permille:
        return ["text/html"] * len(idx)
    r = spec.stream(idx, 9)
    is_bin = (r % U64(1000)).astype(np.int64) < spec.binary_permille
    pick = (spec.stream(idx, 10) % U64(len(_BINARY_CT_CYCLE))).astype(np.int64)
    return [
        _BINARY_CT_CYCLE[p] if b else "text/html" for b, p in zip(is_bin, pick)
    ]


def pixels_of_index(spec: CorpusSpec, i: int) -> np.ndarray:
    """(h, w, 3) uint8 for image ``i`` — the base synthetic field, except
    that with ``dup_image_permille`` on, ~x/1000 of images are a light
    perturbation of an EARLIER image's base pixels (one 16×16 block of one
    channel shifted; same dims as the base — no recursion, like the caption
    near-dups): a planted near-duplicate whose pHash lands within a few bits
    of its source, giving the image-dedup operators real signal to find."""
    if spec.dup_image_permille and i > 0:
        r = spec.stream(np.array([i]), 53)[0]
        if int(r % U64(1000)) < spec.dup_image_permille:
            j = int(spec.stream(np.array([i]), 54)[0] % U64(i))
            px = _base_pixels(spec, j).copy()
            h, w, _ = px.shape
            bs = 16
            by = int(spec.stream(np.array([i]), 55)[0] % U64(max(1, h // bs))) * bs
            bx = int(spec.stream(np.array([i]), 56)[0] % U64(max(1, w // bs))) * bs
            ch = int(spec.stream(np.array([i]), 57)[0] % U64(3))
            px[by : by + bs, bx : bx + bs, ch] += np.uint8(16)  # uint8 wrap —
            # deterministic; small enough that the pHash moves ≤ a few bits
            return px
    return _base_pixels(spec, i)


def _base_pixels(spec: CorpusSpec, i: int) -> np.ndarray:
    """(h, w, 3) uint8 — gradient + two seeded sinusoids per channel (cheap,
    fully deterministic, distinct pHashes across images).

    The field is separable (every term depends on x only or y only), so it is
    synthesized from two 1-D profiles and one broadcast add — O(h+w)
    transcendentals instead of O(h·w), which keeps the verify/regen path
    compute-bound rather than memory-bandwidth-bound on big images."""
    w, h = dims_of_index(spec, np.array([i]))
    w, h = int(w[0]), int(h[0])
    p = spec.stream(np.full(12, i), np.arange(40, 52))  # 12 params
    x = np.arange(w, dtype=np.float64)
    y = np.arange(h, dtype=np.float64)
    out = np.empty((h, w, 3), dtype=np.uint8)
    tmp = np.empty((h, w), dtype=np.float64)  # one reused temp instead of a
    # fresh add + mod + cast temporary per channel: same ufuncs in the same
    # order with out= targets, so the pixels are BIT-IDENTICAL to the
    # original expression (cached corpora and golden pins depend on that),
    # but the dominant broadcast kernel runs 1.9× faster (7.1 → 3.7 ms at
    # 320² — this regen path is ~half the image_verify stage's CPU)
    for c in range(3):
        gx = float(p[c * 4 + 0] % U64(7)) - 3.0
        gy = float(p[c * 4 + 1] % U64(7)) - 3.0
        f1 = 0.05 + float(p[c * 4 + 2] % U64(100)) / 250.0
        ph = float(p[c * 4 + 3] % U64(628)) / 100.0
        row = gx * x + 60.0 * np.sin(f1 * x + ph)               # (w,)
        col = 128.0 + gy * y + 40.0 * np.cos(f1 * 0.7 * y + ph * 0.5)  # (h,)
        np.add(col[:, None], row[None, :], out=tmp)
        np.mod(tmp, 256.0, out=tmp)
        out[:, :, c] = tmp.astype(np.uint8)
    return out


def _base_caption(spec: CorpusSpec, i: int) -> list[str]:
    n_words = 5 + int(spec.stream(np.array([i]), 4)[0] % U64(16))
    picks = spec.stream(np.full(n_words, i), np.arange(100, 100 + n_words))
    return [WORDLIST[int(p % U64(len(WORDLIST)))] for p in picks]


def caption_of_index(spec: CorpusSpec, i: int) -> str:
    """Caption text; ~neardup_permille/1000 of rows are a 1-word edit of an
    earlier row's *base* caption (no recursion → pure)."""
    r = spec.stream(np.array([i]), 5)[0]
    if i > 0 and int(r % U64(1000)) < spec.neardup_permille:
        j = int(spec.stream(np.array([i]), 6)[0] % U64(i))
        words = _base_caption(spec, j)
        pos = int(spec.stream(np.array([i]), 7)[0] % U64(len(words)))
        repl = WORDLIST[int(spec.stream(np.array([i]), 8)[0] % U64(len(WORDLIST)))]
        words = list(words)
        words[pos] = repl
        return " ".join(words)
    return " ".join(_base_caption(spec, i))


def rows_for_indices(spec: CorpusSpec, indices) -> pa.Table:
    """Materialize corpus rows (the mandated 7-column schema) for a set of
    indices. ``phash`` is computed from the *decoded stored bytes*, so the
    lossy-format phash matches what a downstream decoder sees."""
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    fmt_arr = fmt_of_index(spec, np.asarray(indices))
    for k, i in enumerate(np.asarray(indices, dtype=np.int64)):
        i = int(i)
        px = pixels_of_index(spec, i)
        fmt = str(fmt_arr[k])
        data = encode_image(px, fmt)
        decoded = decode_image(data, fmt)
        ids.append(image_id_of_index(i))
        blobs.append(data)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(fmt)
        caps.append(caption_of_index(spec, i))
        phs.append(phash64(decoded))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(phs, pa.int64()),
        }
    )


# ------------------------------------------------------------------- links --


def out_links_batch(spec: CorpusSpec, idxs) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Derived link graph, vectorized over a batch of page indices.

    Per page: 3–12 out-links; ~80 % same-host (within the host's contiguous
    index range), rest global. Anchor text = 6 seeded words; ~20 % of anchors
    contain a priority keyword (feeds the M13 scorer).

    Returns ``(src_idx, link_j, target_idx, anchors)`` as flat parallel
    arrays — one row per link, counter-based streams, so the batched engine
    path and the per-page oracle path compute identical graphs.
    """
    idxs = np.asarray(idxs, dtype=np.int64)
    b = host_boundaries(spec)
    hosts = host_of_index(spec, idxs)
    start = b[hosts.astype(np.int64)]
    end = b[hosts.astype(np.int64) + 1]
    n_out = (3 + (spec.stream(idxs, 10) % U64(10)).astype(np.int64)).astype(np.int64)
    total = int(n_out.sum())
    src = np.repeat(idxs, n_out)
    startr = np.repeat(start, n_out)
    endr = np.repeat(end, n_out)
    offsets = np.cumsum(n_out) - n_out
    jj = np.arange(total, dtype=np.int64) - np.repeat(offsets, n_out)
    same = (spec.stream(src, 20 + jj) % U64(10)) < U64(8)
    tmix = spec.stream(src, 30 + jj)
    span = np.maximum(endr - startr, 1).astype(np.uint64)
    targets = np.where(
        same,
        startr + (tmix % span).astype(np.int64),
        (tmix % U64(spec.n_images)).astype(np.int64),
    )
    # avoid self-links deterministically
    targets = np.where(targets == src, (targets + 1) % spec.n_images, targets)
    # anchors: (total, 6) seeded word picks + keyword injection
    wmix = spec.stream(src[:, None], 200 + 10 * jj[:, None] + np.arange(6)[None, :])
    words = np.array(WORDLIST, dtype="U32")[(wmix % U64(len(WORDLIST))).astype(np.int64)]
    has_kw = (spec.stream(src, 300 + jj) % U64(10)) < U64(2)
    kw_idx = (spec.stream(src, 400 + jj) % U64(len(spec.keywords))).astype(np.int64)
    pos = (spec.stream(src, 500 + jj) % U64(6)).astype(np.int64)
    words[has_kw, pos[has_kw]] = np.array(list(spec.keywords), dtype="U32")[kw_idx[has_kw]]
    anchors = [" ".join(row) for row in words]
    return src, jj, targets, anchors


def out_links_of_index(spec: CorpusSpec, i: int) -> tuple[list[int], list[str]]:
    """Per-page wrapper over :func:`out_links_batch` (oracle-side path)."""
    _, _, targets, anchors = out_links_batch(spec, np.array([i]))
    return [int(t) for t in targets], anchors


# ------------------------------------------------------------------ robots --


@dataclass(frozen=True)
class RobotsPolicy:
    disallow_prefixes: tuple
    crawl_delay_slots: int  # politeness budget: fetches per host per generation

    def allowed(self, path: str) -> bool:
        return not any(path.startswith(p) for p in self.disallow_prefixes)


def robots_for_host(spec: CorpusSpec, host_id: int) -> RobotsPolicy:
    """Synthetic robots.txt per host (M7/S3 analogue): every 5th host
    disallows two /pNN prefix buckets (~2 % of its URLs); crawl-delay budget
    1–4 fetch slots per generation (models crawler.py:204-210 crawl_delay)."""
    base = mix2(np.array([host_id], dtype=np.uint64), np.array([U64(spec.seed * 31 + 5)]))[0]
    prefixes: tuple = ()
    if host_id % 5 == 3:
        b1 = int(base % U64(100))
        b2 = int(splitmix64(np.array([base]))[0] % U64(100))
        prefixes = (f"/p{b1:02d}", f"/p{b2:02d}")
    slots = 1 + int(splitmix64(np.array([base + U64(17)]))[0] % U64(4))
    return RobotsPolicy(prefixes, slots)


# -------------------------------------------------- page images (M3) ---------

_IMG_TAG = 0xA11CE  # stream tag for the per-page embedded-image model
MAX_IMAGES_PER_PAGE = 16  # 1 + (0..15) extra refs → avg ≈ 8.5/page, the
# reference's measured density (12 600 images / 1 455 pages ≈ 8.7,
# crawler.py:447-538 <img> + CSS url(...) extraction)


def page_image_targets(spec: CorpusSpec, i: int) -> np.ndarray:
    """Distinct corpus indices of the images embedded in page i (its own
    image plus sampled same-host refs), deterministic and sorted."""
    b = host_boundaries(spec)
    h = int(host_of_index(spec, np.array([i]))[0])
    lo, size = int(b[h]), int(b[h + 1] - b[h])
    c = 1 + int(spec.stream(np.array([i]), _IMG_TAG)[0] % U64(MAX_IMAGES_PER_PAGE))
    extra = spec.stream(np.full(c - 1, i, dtype=np.int64), np.arange(1, c) + _IMG_TAG)
    return np.unique(np.concatenate([[i], lo + (extra % U64(size)).astype(np.int64)]))


def img_url_of_index(spec: CorpusSpec, idx) -> list[str]:
    """Media URL of an image (distinct from its page URL)."""
    idx = np.asarray(idx, dtype=np.int64)
    hosts = host_of_index(spec, idx)
    fmts = fmt_of_index(spec, idx)
    return [
        f"http://host{h}.example/media/img{int(i):08d}.{f}"
        for i, h, f in zip(idx, hosts, fmts)
    ]


_IMG_URL_RE = re.compile(r"/media/img(\d{8})\.(?:png|jpeg)$")


def index_of_img_url(url: str) -> int:
    m = _IMG_URL_RE.search(url)
    return int(m.group(1)) if m else -1


def page_html_of_index(spec: CorpusSpec, i: int) -> str:
    """The page's 'served HTML' for image extraction (M3 stand-in for the
    stored page body): embeds the page's image refs as <img src> tags, with
    every 4th ref hidden inside a CSS background url(...) instead —
    crawler.py:447-538 extracts both channels. The first ref repeats once so
    the extractor's per-page dedup is exercised."""
    urls = img_url_of_index(spec, page_image_targets(spec, i))
    parts = []
    for j, u in enumerate(urls):
        if j % 4 == 3:
            parts.append(f'<div style="background-image: url({u})">bg</div>')
        else:
            parts.append(f'<img src="{u}" alt="img {j}">')
    if urls:
        parts.append(f'<img src="{urls[0]}" alt="repeat">')
    return "<html><body>" + "".join(parts) + "</body></html>"

SITEMAP_K = 6  # page URLs listed per host sitemap


def robots_txt_for_host(spec: CorpusSpec, host_id: int) -> str:
    """Textual robots.txt for the host (S3 analogue, serving the S4
    discovery): Disallow lines from the policy + a ``Sitemap:`` announcement
    for hosts ≡ 0 (mod 3) (Estrella.py:52-60 reads these lines)."""
    pol = robots_for_host(spec, host_id)
    lines = ["User-agent: *"] + [f"Disallow: {p}" for p in pol.disallow_prefixes]
    if host_id % 3 == 0:
        lines.append(f"Sitemap: http://host{host_id}.example/sitemap-main.xml")
    return "\n".join(lines)


def sitemap_targets(spec: CorpusSpec, host_id: int) -> np.ndarray:
    """Deterministic corpus indices the host's sitemap lists: SITEMAP_K
    evenly-spread URLs of the host's own range."""
    b = host_boundaries(spec)
    lo, hi = int(b[host_id]), int(b[host_id + 1])
    size = hi - lo
    k = min(SITEMAP_K, size)
    return lo + np.unique(np.arange(k, dtype=np.int64) * size // k)


def sitemap_resource(spec: CorpusSpec, host_id: int, url: str) -> str | None:
    """The host's 'web server' for sitemap fetches (deterministic stand-in
    for HTTP): returns XML text or None (404). Layout per host:

    * ``host_id % 3 == 2`` — no sitemap anywhere;
    * ``host_id % 3 == 0`` — announced via robots at ``/sitemap-main.xml``;
    * ``host_id % 3 == 1`` — served at the common probe path
      ``COMMON_SITEMAP_PATHS[host_id % 9]`` (Estrella.py:44-48);
    * even hosts serve a flat ``<urlset>``; odd hosts serve a
      ``<sitemapindex>`` of two child urlsets (the recursive-parse case —
      note probing rejects index files by the reference's ``"<urlset"``
      validity check, so odd probe-channel hosts are faithfully
      undiscoverable)."""
    from ..functions import sitemap as SM

    base = f"http://host{host_id}.example"
    if not url.startswith(base + "/"):
        return None
    path = url[len(base):]
    if host_id % 3 == 2:
        return None
    canonical = (
        "/sitemap-main.xml"
        if host_id % 3 == 0
        else "/" + SM.COMMON_SITEMAP_PATHS[host_id % 9]
    )
    urls = url_of_index(spec, sitemap_targets(spec, host_id))
    if host_id % 2 == 0:
        return SM.urlset_xml(urls) if path == canonical else None
    if path == canonical:
        return SM.sitemapindex_xml([f"{base}/sm-child-0.xml", f"{base}/sm-child-1.xml"])
    if path == "/sm-child-0.xml":
        return SM.urlset_xml(urls[: len(urls) // 2])
    if path == "/sm-child-1.xml":
        return SM.urlset_xml(urls[len(urls) // 2:])
    return None


def sitemap_urls_for_host(spec: CorpusSpec, host_id: int) -> list[str]:
    """The full S4 discovery for one host — robots Sitemap: lines, common-
    path probing, recursive index parse ≤ 3 — shared verbatim by the oracle
    and the Ray engine."""
    from ..functions import sitemap as SM

    return SM.discover_sitemap_urls(
        robots_txt_for_host(spec, host_id),
        lambda u: sitemap_resource(spec, host_id, u),
        base=f"http://host{host_id}.example",
    )


# ----------------------------------------------------------------- builder --


def corpus_path(root: str, spec: CorpusSpec) -> str:
    dims = "x".join(str(d) for d in spec.dim_choices)
    # dup_image_permille changes STORED bytes/phash so it must key the path;
    # suffix only when nonzero to keep existing cached corpora valid
    # (binary_permille is fetch-time-only and correctly absent)
    dup = f"-dup{spec.dup_image_permille}" if spec.dup_image_permille else ""
    return (
        f"{root}/corpus4-n{spec.n_images}-h{spec.n_hosts}-s{spec.seed}"
        f"-b{spec.num_buckets}-d{dims}-nd{spec.neardup_permille}{dup}"
    )


def build_corpus(spec: CorpusSpec, path: str, overwrite: bool = False) -> str:
    """Generate the corpus as a Ray pipeline → Lance-layout table partitioned
    by host bucket. Skips work if the table already exists (same spec ⇒ same
    path ⇒ same bytes)."""
    from . import lance_table

    if lance_table.exists(path) and not overwrite:
        return path
    import ray.data as rd

    spec_dict = spec.__dict__.copy()

    def gen(batch: pa.Table) -> pa.Table:
        sp = CorpusSpec(**spec_dict)
        idx = batch["id"].to_numpy()
        t = rows_for_indices(sp, idx)
        hostid = host_of_index(sp, idx)
        return t.append_column("part", pa.array(bucket_of_host(sp, hostid), pa.int32()))

    n_blocks = max(spec.num_buckets, min(64, spec.n_images // 2000 + 1))
    ds = rd.range(spec.n_images, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=2048
    )
    lance_table.write_dataset(ds, path, partition_col="part", compression="NONE")
    return path

"""Sitemap discovery + parse — S4 in SURVEY §2.1.

Reproduces the reference's discovery procedure
(``pa1/crawler/Estrella.py:40-91`` + the recursive variant in
``oldstufffrompa1/crawler.py:699-838``):

1. parse ``Sitemap:`` lines out of robots.txt (case-insensitive prefix),
2. if none announced, probe the 9 common sitemap paths, accepting a probe
   only when the fetched body contains ``"<urlset"`` — the reference's
   validity check, which (faithfully) never discovers a sitemapindex file
   via probing,
3. fetch each sitemap; ``<sitemapindex>`` files recurse into their child
   ``<loc>`` entries up to depth 3; ``<urlset>`` files contribute their
   ``<loc>`` URLs.

The fetch callable is injected: the crawl corpus supplies a deterministic
"server" (sources/corpus.py:sitemap_resource) in this sandbox; a real
deployment passes an HTTP fetcher with the same signature.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

# Estrella.py:44-48
COMMON_SITEMAP_PATHS = [
    "sitemap.xml",
    "sitemap_index.xml",
    "sitemap/sitemap.xml",
    "sitemaps/sitemap.xml",
    "wp-sitemap.xml",
    "sitemap-index.xml",
    "wp-sitemap-index.xml",
    "main-sitemap.xml",
    "forum-sitemap.xml",
]

MAX_INDEX_DEPTH = 3  # recursive sitemapindex limit (crawler.py:735-760)


def urlset_xml(urls: list[str]) -> str:
    body = "".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0"?><urlset xmlns="{SITEMAP_NS}">{body}</urlset>'


def sitemapindex_xml(sitemap_urls: list[str]) -> str:
    body = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in sitemap_urls)
    return f'<?xml version="1.0"?><sitemapindex xmlns="{SITEMAP_NS}">{body}</sitemapindex>'


def parse_sitemap(xml_text: str) -> tuple[str, list[str]]:
    """→ ("urlset" | "index" | "invalid", loc list). Namespaced and bare
    <loc> elements both accepted (real-world sitemaps are sloppy)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return "invalid", []
    tag = root.tag.rsplit("}", 1)[-1]
    locs = [
        e.text.strip()
        for e in root.iter()
        if e.tag.rsplit("}", 1)[-1] == "loc" and e.text and e.text.strip()
    ]
    if tag == "urlset":
        return "urlset", locs
    if tag == "sitemapindex":
        return "index", locs
    return "invalid", []


def robots_sitemap_lines(robots_txt: str) -> list[str]:
    """``Sitemap:`` URL extraction (Estrella.py:52-60)."""
    out = []
    for line in (robots_txt or "").splitlines():
        if line.lower().startswith("sitemap:"):
            url = line.split(":", 1)[1].strip()
            if url:
                out.append(url)
    return out


def discover_sitemap_urls(
    robots_txt: str,
    fetch: Callable[[str], str | None],
    base: str = "",
    max_depth: int = MAX_INDEX_DEPTH,
) -> list[str]:
    """The full S4 procedure → page URLs, in announcement/probe order.

    ``fetch`` maps an absolute sitemap URL (or ``base``-relative path) to
    the body text, or None on a 404-equivalent."""
    roots = robots_sitemap_lines(robots_txt)
    if not roots:
        for path in COMMON_SITEMAP_PATHS:
            candidate = f"{base.rstrip('/')}/{path}" if base else path
            body = fetch(candidate)
            if body is not None and "<urlset" in body:  # Estrella.py:69-77
                roots.append(candidate)
    out: list[str] = []
    seen_maps: set[str] = set()

    def walk(url: str, depth: int) -> None:
        if depth > max_depth or url in seen_maps:
            return
        seen_maps.add(url)
        body = fetch(url)
        if body is None:
            return
        kind, locs = parse_sitemap(body)
        if kind == "urlset":
            out.extend(locs)
        elif kind == "index":
            for child in locs:
                walk(child, depth + 1)

    for r in roots:
        walk(r, 1)
    return out

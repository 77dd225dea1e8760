"""URL canonicalization and parsing — mirrors crawler.py:339-360 (M1 in SURVEY §2.2).

Semantics (reference parity):
  * lowercase scheme and netloc
  * drop the fragment
  * strip one trailing slash from the path unless the path is exactly "/"
  * params/query preserved as-is

Implemented as a vectorized fast path (regex split; URLs in the crawl corpus are
simple ``http://host/path`` strings) with a urllib fallback for anything the
fast pattern doesn't match, so behavior equals ``urlunparse(urlparse(...))`` of
the reference for all inputs.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse, urlunparse

import numpy as np

_SIMPLE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$")


def canonicalize_url(url: str) -> str:
    """Canonicalize a single URL (reference semantics, crawler.py:339-360)."""
    m = _SIMPLE.match(url)
    if m:
        scheme, netloc, path, query, _frag = m.groups()
        if path.endswith("/") and path != "/":
            path = path[:-1]
        return f"{scheme.lower()}://{netloc.lower()}{path}{query or ''}"
    p = urlparse(url)
    path = p.path
    if path.endswith("/") and path != "/":
        path = path[:-1]
    return urlunparse((p.scheme.lower(), p.netloc.lower(), path, p.params, p.query, ""))


def canonicalize_urls(urls) -> list[str]:
    """Batch canonicalization. Python loop over short strings — this runs inside
    map_batches over a few-thousand-row batch; regex fast path keeps it cheap."""
    return [canonicalize_url(u) for u in urls]


def hosts_of(urls) -> list[str]:
    """netloc (lowercased) per URL."""
    out = []
    for u in urls:
        m = _SIMPLE.match(u)
        out.append(m.group(2).lower() if m else urlparse(u).netloc.lower())
    return out


def paths_of(urls) -> list[str]:
    out = []
    for u in urls:
        m = _SIMPLE.match(u)
        out.append(m.group(3) if m else urlparse(u).path)
    return out


def host_buckets(hosts, num_buckets: int) -> np.ndarray:
    """Host-affine partition id per URL: hash(host) % P (SURVEY §7.4)."""
    from .hashing import hash64

    return (hash64(list(hosts)) % np.uint64(num_buckets)).astype(np.int32)

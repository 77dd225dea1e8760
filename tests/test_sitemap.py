"""Sitemap discovery/parse (S4) unit tests — Estrella.py:40-91 semantics."""

from __future__ import annotations

from ieps_crawler_ray.functions.sitemap import (
    COMMON_SITEMAP_PATHS,
    discover_sitemap_urls,
    parse_sitemap,
    robots_sitemap_lines,
    sitemapindex_xml,
    urlset_xml,
)
from ieps_crawler_ray.sources import corpus as C

SPEC = C.CorpusSpec(n_images=500, n_hosts=10, num_buckets=4)


def test_parse_roundtrip():
    urls = ["http://a.example/1", "http://a.example/2"]
    assert parse_sitemap(urlset_xml(urls)) == ("urlset", urls)
    assert parse_sitemap(sitemapindex_xml(urls)) == ("index", urls)
    assert parse_sitemap("not xml at all")[0] == "invalid"
    assert parse_sitemap("<html><body>404</body></html>")[0] == "invalid"


def test_robots_sitemap_lines_case_insensitive():
    txt = "User-agent: *\nDisallow: /x\nSitemap: http://h.example/s.xml\nSITEMAP: http://h.example/t.xml"
    assert robots_sitemap_lines(txt) == ["http://h.example/s.xml", "http://h.example/t.xml"]
    assert robots_sitemap_lines("User-agent: *") == []


def test_probe_rejects_index_files():
    # the reference's validity check requires "<urlset" in the body
    # (Estrella.py:69-77), so probing never discovers a sitemapindex
    serv = {f"/{COMMON_SITEMAP_PATHS[0]}": sitemapindex_xml(["http://h.example/c.xml"]),
            "/c.xml": urlset_xml(["http://h.example/p1"])}
    got = discover_sitemap_urls("", lambda u: serv.get(u.replace("http://h.example", "")), base="http://h.example")
    assert got == []


def test_announced_index_recurses():
    serv = {
        "/s.xml": sitemapindex_xml(["http://h.example/a.xml", "http://h.example/b.xml"]),
        "/a.xml": urlset_xml(["http://h.example/p1"]),
        "/b.xml": urlset_xml(["http://h.example/p2"]),
    }
    got = discover_sitemap_urls(
        "Sitemap: http://h.example/s.xml",
        lambda u: serv.get(u.replace("http://h.example", "")),
    )
    assert got == ["http://h.example/p1", "http://h.example/p2"]


def test_recursion_depth_capped_at_3():
    # s -> i2 -> i3 -> i4 -> urlset: the urlset sits at depth 4 and must NOT
    # be reached; a chain one shorter must be
    deep = {
        "/s.xml": sitemapindex_xml(["http://h.example/i2.xml"]),
        "/i2.xml": sitemapindex_xml(["http://h.example/i3.xml"]),
        "/i3.xml": sitemapindex_xml(["http://h.example/i4.xml"]),
        "/i4.xml": urlset_xml(["http://h.example/deep"]),
    }
    fetch = lambda u: deep.get(u.replace("http://h.example", ""))
    assert discover_sitemap_urls("Sitemap: http://h.example/s.xml", fetch) == []
    ok = dict(deep)
    ok["/i3.xml"] = urlset_xml(["http://h.example/ok"])
    fetch2 = lambda u: ok.get(u.replace("http://h.example", ""))
    assert discover_sitemap_urls("Sitemap: http://h.example/s.xml", fetch2) == ["http://h.example/ok"]


def test_corpus_sitemap_channels():
    # h%3==0: robots-announced; h%3==1 even: common-path probe; h%3==2: none;
    # h%3==1 odd: exists but undiscoverable (index behind the probe check)
    for h in range(SPEC.n_hosts):
        urls = C.sitemap_urls_for_host(SPEC, h)
        if h % 3 == 2 or (h % 3 == 1 and h % 2 == 1):
            assert urls == [], f"host {h}"
        else:
            assert urls, f"host {h}"
            # every listed URL is a canonical URL of the SAME host
            idx = C.indices_of_urls(urls)
            assert (idx >= 0).all()
            assert (C.host_of_index(SPEC, idx) == h).all()


def test_corpus_sitemap_deterministic():
    a = C.sitemap_urls_for_host(SPEC, 0)
    b = C.sitemap_urls_for_host(SPEC, 0)
    assert a == b and len(a) == len(set(a))

"""M3 multi-image-per-page extraction tests."""

from __future__ import annotations

import numpy as np

from ieps_crawler_ray.functions.html_clean import extract_image_urls
from ieps_crawler_ray.sources import corpus as C

SPEC = C.CorpusSpec(n_images=500, n_hosts=10, num_buckets=4)


def test_extract_image_urls_channels_and_dedup():
    html = (
        "<html><head><style>.hero { background: url('http://x.example/media/img00000003.png'); }</style></head>"
        '<body><img src="http://x.example/media/img00000001.png">'
        '<div style="background-image: url(http://x.example/media/img00000002.jpeg)">x</div>'
        '<img src="http://x.example/media/img00000001.png">'  # dup
        "<img alt='no src'></body></html>"
    )
    assert extract_image_urls(html) == [
        "http://x.example/media/img00000003.png",
        "http://x.example/media/img00000001.png",
        "http://x.example/media/img00000002.jpeg",
    ]
    assert extract_image_urls("") == []


def test_page_html_roundtrip_matches_model():
    """The extractor must recover exactly the page's modeled image set
    (the repeated first ref collapses via per-page dedup)."""
    for i in [0, 7, 123, 499]:
        urls = extract_image_urls(C.page_html_of_index(SPEC, i))
        expect = C.img_url_of_index(SPEC, C.page_image_targets(SPEC, i))
        assert urls == expect, f"page {i}"
        idx = [C.index_of_img_url(u) for u in urls]
        assert idx == list(C.page_image_targets(SPEC, i))


def test_images_per_page_density():
    """avg embedded images/page ≈ the reference's measured 8.7/page."""
    counts = [len(C.page_image_targets(SPEC, i)) for i in range(300)]
    avg = float(np.mean(counts))
    assert 5.0 <= avg <= 11.0, avg
    assert max(counts) > 1 and min(counts) >= 1


def test_extract_refs_exceed_pages(ray_session):
    from ieps_crawler_ray.pipelines.crawl_pipeline import extract_page_image_refs
    from ieps_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from ieps_crawler_ray.semantics import CrawlParams

    import shutil

    corpus = C.build_corpus(SPEC, C.corpus_path("/tmp/ieps_crawler_ray", SPEC))
    params = CrawlParams(spec=SPEC, max_pages=60, politeness=True, politeness_factor=3)
    root = "/tmp/ieps_crawler_ray/ckpt-m3"
    shutil.rmtree(root, ignore_errors=True)
    res = run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus)
    pages = res.pages_table()
    refs = extract_page_image_refs(pages, SPEC)
    n_html = pages.filter(
        __import__("pyarrow").compute.equal(pages["status"], "html")
    ).num_rows
    assert refs.num_rows > n_html, (refs.num_rows, n_html)
    # every ref resolves to a real corpus index
    assert (refs["img_idx"].to_numpy() >= 0).all()
    assert (refs["img_idx"].to_numpy() < SPEC.n_images).all()

"""Exemplar-export sink tests (S9, export_data.py:13-367)."""

from __future__ import annotations

import json
import os
import shutil

from ieps_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from ieps_crawler_ray.pipelines.export import export_content_samples
from ieps_crawler_ray.semantics import CrawlParams
from ieps_crawler_ray.sources import corpus as C

SPEC = C.CorpusSpec(
    n_images=500, n_hosts=10, num_buckets=4, neardup_permille=300, binary_permille=100
)


def test_export_one_exemplar_per_family(ray_session, tmp_path):
    corpus = C.build_corpus(SPEC, C.corpus_path("/tmp/ieps_crawler_ray", SPEC))
    params = CrawlParams(spec=SPEC, max_pages=80, politeness=True, politeness_factor=3)
    root = "/tmp/ieps_crawler_ray/ckpt-export"
    shutil.rmtree(root, ignore_errors=True)
    run_crawl(CrawlConfig(params=params, root=root), corpus_path=corpus)

    out = str(tmp_path / "samples")
    written = export_content_samples(root, SPEC, corpus, out)

    # page + metadata
    assert "html" in written and os.path.exists(written["html"])
    meta = json.load(open(written["html"].replace(".html", "_meta.json")))
    assert meta["status"] == "html" and meta["url"].startswith("http://host")
    body = open(written["html"]).read()
    assert "<img" in body  # the M3 image refs are in the served HTML

    # duplicate info referencing an earlier winner
    assert "duplicate" in written
    dup = json.load(open(written["duplicate"]))
    assert dup["original_rank"] < dup["duplicate_rank"]

    # decoded image bytes round-trip through the codec
    from ieps_crawler_ray.functions.codecs import decode_image

    assert "image" in written
    px = decode_image(open(written["image"], "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3

    # robots + sitemap + links + data-type registry
    assert "robots" in written and "User-agent" in open(written["robots"]).read()
    assert "links" in written
    links = json.load(open(written["links"]))
    assert links["n_links"] == len(links["to_urls"]) > 0
    reg = json.load(open(written["data_types"]))
    assert reg["application/pdf"] == "PDF" and len(reg) == 15

    # BINARY page exemplar (export_data.py:97-149): data-type code + mimetype
    assert "binary" in written
    b = json.load(open(written["binary"]))
    assert b["data_type"] in reg.values()
    assert reg[b["content_type"]] == b["data_type"]

"""Acceptance-audit runner (validate_crawler.py:32-47 analogue) over a
fixture crawl checkpoint."""

from __future__ import annotations

import shutil

from ieps_crawler_ray.pipelines import audit
from ieps_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from ieps_crawler_ray.semantics import CrawlParams
from ieps_crawler_ray.sources import corpus as C

SPEC = C.CorpusSpec(
    n_images=500, n_hosts=10, num_buckets=4, neardup_permille=300, binary_permille=100
)


def _checkpoint(tmp_root: str) -> str:
    corpus = C.build_corpus(SPEC, C.corpus_path("/tmp/ieps_crawler_ray", SPEC))
    params = CrawlParams(spec=SPEC, max_pages=80, politeness=True, politeness_factor=3)
    shutil.rmtree(tmp_root, ignore_errors=True)
    run_crawl(CrawlConfig(params=params, root=tmp_root), corpus_path=corpus)
    return tmp_root


def test_audit_passes_on_good_checkpoint(ray_session):
    root = _checkpoint("/tmp/ieps_crawler_ray/ckpt-audit")
    rows = audit.run_all_checks(root, SPEC, politeness_factor=3, min_pages=80)
    assert [r["check"] for r in rows] == [
        "page_count",
        "html_content",
        "content_hash_index",
        "binary_pages",
        "duplicates",
        "links",
        "robots",
        "politeness",
        "lineage",
    ]
    failed = [r for r in rows if not r["passed"]]
    assert not failed, failed
    # every family the fixture crawl produces is actually exercised
    detail = {r["check"]: r["detail"] for r in rows}
    assert "duplicate" in detail["page_count"] and "binary" in detail["page_count"]


def test_audit_cli_exit_codes(ray_session, capsys):
    root = "/tmp/ieps_crawler_ray/ckpt-audit"
    rc = audit.main(
        [
            "--root", root,
            "--n-images", "500", "--n-hosts", "10", "--num-buckets", "4",
            "--neardup-permille", "300", "--binary-permille", "100",
            "--politeness-factor", "3", "--min-pages", "80",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "9/9 checks passed" in out

    # a check that can't hold (min_pages above the crawl size) must fail loudly
    rc_bad = audit.main(
        [
            "--root", root,
            "--n-images", "500", "--n-hosts", "10", "--num-buckets", "4",
            "--neardup-permille", "300", "--binary-permille", "100",
            "--politeness-factor", "3", "--min-pages", "10000",
        ]
    )
    out2 = capsys.readouterr().out
    assert rc_bad == 1 and "[FAIL] page_count" in out2

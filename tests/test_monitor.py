"""Monitoring report (monitoring.py:25-227 analogue) over a fixture crawl."""

from __future__ import annotations

import shutil

from ieps_crawler_ray.pipelines import monitor
from ieps_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from ieps_crawler_ray.semantics import CrawlParams
from ieps_crawler_ray.sources import corpus as C

SPEC = C.CorpusSpec(n_images=500, n_hosts=10, num_buckets=4, neardup_permille=300)
ROOT = "/tmp/ieps_crawler_ray/ckpt-monitor"


def _checkpoint(ray_session) -> str:
    corpus = C.build_corpus(SPEC, C.corpus_path("/tmp/ieps_crawler_ray", SPEC))
    params = CrawlParams(spec=SPEC, max_pages=60, politeness=True, politeness_factor=3)
    shutil.rmtree(ROOT, ignore_errors=True)
    run_crawl(CrawlConfig(params=params, root=ROOT), corpus_path=corpus)
    return ROOT


def test_crawl_stats_and_report(ray_session):
    root = _checkpoint(ray_session)
    s = monitor.crawl_stats(root)
    assert s["n_pages"] == 60 and s["finished"]
    assert s["page_types"].get("html", 0) > 0 and s["n_links"] > 0
    assert len(s["gen_rates"]) == s["state"]["gen"]
    assert "fetch" in s["stage_secs"] and "frontier_write" in s["stage_secs"]

    rep = monitor.display_stats(root, target_pages=60)
    assert "pages: 60" in rep and "page types:" in rep
    assert "estimated completion: complete" in rep


def test_monitor_loop_and_cli(ray_session, capsys):
    monitor.monitor(ROOT, interval=0.01, target_pages=60, max_ticks=2)
    out = capsys.readouterr().out
    assert "=== tick 0" in out and "CRAWLER STATISTICS" in out

    assert monitor.main(["--root", ROOT, "--target-pages", "100"]) == 0
    out = capsys.readouterr().out
    assert "estimated completion: ~" in out or "unknown" in out
    assert monitor.main(["--root", ROOT + "-missing"]) == 1


def test_estimate_and_sparkline_edges():
    assert monitor.estimate_completion(10, 0.0, 100).startswith("unknown")
    assert monitor.estimate_completion(100, 5.0, 100) == "complete"
    assert monitor.estimate_completion(0, 1.0, 60) == "~60 s"
    assert monitor.estimate_completion(0, 1.0, 3600) == "~60 min"
    assert monitor.estimate_completion(0, 1.0, 999_999).endswith("h")
    assert monitor.sparkline([]) == ""
    assert len(monitor.sparkline([1, 2, 3])) == 3
    assert monitor.sparkline([5, 5]) == "▁▁"

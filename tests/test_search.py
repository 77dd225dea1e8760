"""pa2 search-API surface tests (semantic / hybrid / url / page-content)."""

from __future__ import annotations

from ieps_crawler_ray.pipelines.search import (
    get_page_content,
    keyword_and_semantic_search,
    semantic_search,
    url_content_search,
)

SF = "/root/testdata/sf0.001"


def test_semantic_search_self_retrieval(ray_session):
    text = get_page_content(3, SF)
    assert text
    out = semantic_search(text, limit=5, sf_dir=SF)
    assert 3 in set(out["doc_id"]), "a document must retrieve itself"
    assert out["sim"].is_monotonic_decreasing


def test_semantic_threshold_filters(ray_session):
    out = semantic_search("vector index scan", limit=50, threshold=0.5, sf_dir=SF)
    assert (out["sim"] >= 0.5).all()


def test_hybrid_ranks_keyword_hits(ray_session):
    out = keyword_and_semantic_search("vector", limit=10, sf_dir=SF)
    assert {"doc_id", "score", "sim"} <= set(out.columns)
    assert out["score"].is_monotonic_decreasing


def test_url_content_search_filters_source(ray_session):
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet", columns=["source"])["source"][0].as_py()
    out = url_content_search(src[:4], "vector", limit=5, sf_dir=SF)
    assert len(out) > 0


def test_get_page_content_missing_is_empty(ray_session):
    assert get_page_content(10**9, SF) == ""

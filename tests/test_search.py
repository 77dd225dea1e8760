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


def _brute_force(sf_dir: str, query: str):
    """Exact numpy ranking over the whole corpus (no per-batch pruning)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ieps_crawler_ray.functions.text import embed_texts
    from ieps_crawler_ray.pipelines.search import EMBED_DIM

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    ids = t["doc_id"].to_numpy()
    q = embed_texts([query], dim=EMBED_DIM)[0]
    sims = (embed_texts(texts, dim=EMBED_DIM) @ q).astype(np.float64)
    kw = query.lower().split()
    hits = np.array([sum(k in x.lower() for k in kw) for x in texts], dtype=np.int64)
    return ids, sims, hits


def test_semantic_search_matches_brute_force(ray_session):
    """Regression for the round-1 wrong-answer bug: per-batch partial top-k
    pruned by sims+hits while the caller ranked by sim alone, evicting
    high-sim/zero-hit docs (repro: 'table row' at sf0.01 dropped doc 108)."""
    import numpy as np

    sf = "/root/testdata/sf0.01"
    for query in ["table row", "the data", "value part hash"]:
        ids, sims, _ = _brute_force(sf, query)
        order = np.lexsort((ids, -sims))[:10]
        expect = list(ids[order])
        got = list(semantic_search(query, limit=10, sf_dir=sf)["doc_id"])
        assert got == expect, f"{query!r}: {got} != {expect}"


def test_hybrid_search_matches_brute_force(ray_session):
    import numpy as np

    sf = "/root/testdata/sf0.01"
    for query in ["table row", "value part hash"]:
        ids, sims, hits = _brute_force(sf, query)
        n_kw = max(len(query.split()), 1)
        score = 0.6 * sims + 0.4 * np.clip(hits / n_kw, None, 1.0)
        order = np.lexsort((ids, -score))[:10]
        expect = list(ids[order])
        got = list(keyword_and_semantic_search(query, limit=10, sf_dir=sf)["doc_id"])
        assert got == expect, f"{query!r}: {got} != {expect}"

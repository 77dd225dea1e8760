"""Golden-value gates for the driver queries that have NO DuckDB oracle
(custom hashes / heuristics / ANN — not SQL-expressible). Every kernel is
seeded and deterministic, so the full result set at sf0.001 is pinned by an
md5 over the canonicalized frame: 'rows-only' stops meaning 'row-count-only'.

If a kernel changes intentionally (seed, algorithm), re-pin with:
    python tests/test_golden_values.py --print
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

GOLDEN = {
    "simhash_docs": (500, "12093212de99c15ef5c6cbbf86905e6d"),
    "simhash_neardup_pairs": (3297, "2a978bfd2d8c80cff0b284bb1e36ddf4"),
    "doc_fingerprints": (500, "470e41888c3e9ef69cd9d4326d009ff2"),
    "lang_id_docs": (4, "2a9b76c5350bbe019d324476bb4c07cc"),
    "doc_embed_knn": (10, "c4898554b014779e3f112d64ad477365"),
    "embedding_topk_ivf": (10, "191863771eb97850da3ba7dd297f8b84"),
    # sign-LSH multiprobe ANN (recall/determinism additionally gated in
    # test_analytics_extra); pin freezes the exact driver-visible rows
    "embedding_topk_lsh": (10, "21e57b3cc98f48c26001db8ece68c42e"),
    "media_features": (2, "378914ed9bcc052468c1e2053a70369b"),
    # crawl-backed queries (engine output is parity-gated vs the sequential
    # oracle; these pins additionally freeze the exact driver-visible VALUES)
    "crawl_pages": (3, "b518356c70e8d3e625a3ebc89b14e653"),
    "crawl_order": (100, "d053f5f886d8a7d94d37e5d168d15424"),
    "crawl_frontier_metrics": (4, "3a75db9b90e6141deacdba61dd6f6358"),
    "crawl_link_stats": (1, "e83ddaa99af92ffe4100f41c433447d0"),
    "crawl_images_verify": (2, "cf4a0419e39ea28c9151f58aa9830a34"),
    "crawl_sitemap_stats": (1, "619f9eb4b85d0e1bb001105132ad6634"),
    "image_verify": (2, "00c87b6b75fab4c968b1a72a8f3dc7c8"),
    # image-modality near-dup pairs (pHash banded LSH; brute-force-equality
    # gated in test_wave13)
    "image_phash_neardup": (32, "1b30753d1bce135b1f570a4adf16b619"),
    # connected components over those pairs (driver union-find on the
    # dup-rate-bounded edge set; brute-force recompute in test_wave14)
    "image_phash_clusters": (31, "ca1441b72e197aca5ba9efdbbe532506"),
    # caption near-dup pairs annotated with image pHash hamming (cross-modal
    # consistency miner; brute-force-equality gated in test_wave15)
    "caption_image_consistency": (14, "c614af407e7955318044d35955fddfb7"),
    # first-wins keep/drop manifest from the pHash cluster graph (BFS
    # recompute in test_wave15)
    "image_dedup_manifest": (2, "a556484136d51016e3e5af2f85f4fe31"),
    "image_thumbnails": (2, "863a5a5e1bfd809635feb97d9d066731"),
    "crawl_audit": (9, "29b98f6a71a39653eb67f29e789b27d1"),
    # sketch estimate (deterministic seed; accuracy separately tolerance-gated
    # vs exact distinct in test_analytics_extra)
    "approx_distinct_hll": (6, "85645e39b32710b60aa746c0565d94af"),
    # DDSketch quantile estimate (deterministic; relative-tolerance-gated vs
    # exact quantile_disc in test_analytics_extra)
    "price_quantile_sketch": (3, "18260dcd661c5ba201017b3cf2e26f7f"),
    # iterative spherical k-means (not SQL-expressible; hash-seeded centroids)
    "embedding_clusters": (16, "bae562247cd9f086c9d4dfe91a0c216b"),
    # SemDeDup within-cluster semantic dedup (k-means-based; full numpy
    # recompute in test_wave13)
    "semantic_dedup": (16, "47801c827b8672547d0a8bd6d3412e4a"),
    # Rabin-CDC chunk dedup stats (rolling hash not SQL-expressible; kernel
    # recompute-tested in test_wave14)
    "cdc_chunk_stats": (5, "6e0d332bb9b9682151e4539822eb584f"),
    # iterative PageRank (not SQL-expressible; independently recomputed from
    # the per-page link oracle in test_wave3)
    "host_pagerank": (10, "1388bd87863ab5a6dc275eb14056e433"),
    # distributed PCA (not SQL-expressible; independently recomputed with
    # full-matrix numpy in test_wave5; evr rounded to 6 decimals so
    # block-order summation jitter ~1e-12 cannot move the pin)
    "embedding_pca": (4, "9bb9785f973fecb086ab2534cd01d1de"),
    # product-quantization ANN (deterministic first-K Lloyd; recall vs the
    # brute-force oracle additionally gated in test_wave16)
    "embedding_topk_pq": (10, "a8cac6d385f2f8afd352f5596db4a587"),
    # decoded-pixel luma moments per format (actor-pool decode; numpy
    # recompute in test_wave18; round(4) absorbs partial-sum order jitter)
    "image_pixel_stats": (2, "0277056478956f36839b1560997ee7fc"),
    # pHash hamming histogram over banded-LSH candidates (integer counts;
    # brute-force recompute in test_wave18)
    "phash_hamming_histogram": (13, "1048a6b0028b284012733ca9fb0bbf22"),
    # greedy MMR diverse rerank (iterative argmax not SQL-expressible;
    # diversity property additionally gated in test_wave26)
    "mmr_diverse_topk": (10, "41de3d0ee25f065aa0102e330e99328c"),
    # iterative HITS hubs/authorities (not SQL-expressible; dense numpy
    # recompute in test_round5)
    "host_hits": (10, "85bc490c01b8107dda891aa9d71f60a2"),
    # PAVA isotonic fit (iterative pooling not SQL-expressible; independent
    # recompute + invariants in test_round5)
    "discount_isotonic": (11, "3a86e0b3677a5e024532e02f5511efa4"),
    # all-sources BFS harmonic centrality (iterative; dense Floyd-Warshall
    # recompute in test_round5)
    "host_closeness": (10, "46456cc56abb6490f61a1f23dc71f64d"),
    # TextRank keyword scores (iterative; dense-matrix recompute in
    # test_round5)
    "textrank_keywords": (10, "7807d01359d716d05fac1f225b932a62"),
    # iterative 5-round BPE merge picks (pure-python reference BPE
    # recompute in test_round5)
    "bpe_merges": (5, "fb04e2485b565b12b3930d92712b49ab"),
    # Poisson-bootstrap CI (hash-seeded resampling; numpy recompute +
    # bracketing invariants in test_round5)
    "revenue_bootstrap_ci": (1, "b96fc0836995f1df42585ecfb669c957"),
    # ANN recall@10 report (intersections of already-gated deterministic
    # index outputs)
    "ann_recall_report": (4, "97f3ddbabce8c702fb0008064fc3c730"),
}


def _canon(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = obj.to_pandas()
    df = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    return df.round(8)


def _digest(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(name, ray_session):
    import __ray_entry__ as entry

    df = _canon(entry.queries()[name](SF))
    n, want = GOLDEN[name]
    assert len(df) == n, f"{name}: {len(df)} rows != {n}"
    got = _digest(df)
    assert got == want, f"{name}: value hash {got} != pinned {want}"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, "/root/repo")
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entry

    for name in sorted(GOLDEN):
        df = _canon(entry.queries()[name](SF))
        print(f'    "{name}": ({len(df)}, "{_digest(df)}"),')
    ray.shutdown()

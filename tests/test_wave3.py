"""Round-3 wave-3 operators: funnel / cohort / co-purchase / vector centroid /
inverted-index postings (oracle-compared vs DuckDB in-process, same compare
the driver runs) and host-level PageRank (independently recomputed from the
per-page oracle link enumeration)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

WAVE3_ORACLE = [
    "event_funnel",
    "cohort_retention",
    "copurchase_pairs",
    "label_centroids",
    "term_postings",
    "docs_weighted_sample",
    "docs_shared_span_pairs",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(obj) -> pd.DataFrame:
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return df[sorted(df.columns)].reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE3_ORACLE)
def test_wave3_matches_oracle(ray_session, name):
    from ieps_crawler_ray.pipelines import analytics

    mine = _norm(analytics.QUERIES[name](SF))
    orc = _norm(_oracle(analytics.ORACLE_SQL[name]))
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_host_pagerank_matches_dense_recompute(ray_session):
    """Independent check: rebuild the host transition matrix from the
    per-page oracle link enumeration (out_links_of_index — the same API the
    sequential parity crawler uses) and run a dense power iteration."""
    from ieps_crawler_ray.pipelines.crawl_pipeline import _spec_for_sf, q_host_pagerank
    from ieps_crawler_ray.sources import corpus as C

    spec = _spec_for_sf(SF)
    nh = spec.n_hosts
    W = np.zeros((nh, nh))
    for i in range(spec.n_images):
        targets, _anchors = C.out_links_of_index(spec, i)
        hs = int(C.host_of_index(spec, np.array([i]))[0])
        for t in targets:
            hd = int(C.host_of_index(spec, np.array([t]))[0])
            W[hs, hd] += 1.0
    out_w = W.sum(axis=1)
    rank = np.full(nh, 1.0 / nh)
    for _ in range(20):
        contrib = np.zeros(nh)
        nz = out_w > 0
        contrib += (W[nz] * (rank[nz] / out_w[nz])[:, None]).sum(axis=0)
        dangling = rank[~nz].sum()
        rank = 0.15 / nh + 0.85 * (contrib + dangling / nh)
    expect = pd.DataFrame({"host": np.arange(nh, dtype=np.int64), "rank": rank.round(8)})
    expect = (
        expect.sort_values(["rank", "host"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    got = q_host_pagerank(SF)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False, atol=1e-8)
    # ranks are a probability distribution over hosts
    assert got["rank"].between(0, 1).all()


def test_host_pagerank_deterministic(ray_session):
    from ieps_crawler_ray.pipelines.crawl_pipeline import q_host_pagerank

    a, b = q_host_pagerank(SF), q_host_pagerank(SF)
    pd.testing.assert_frame_equal(a, b)

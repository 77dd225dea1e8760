"""Round-3 wave-5 operators: the classic join/agg shapes that were still
missing from the inventory — TPC-H Q5 (star join with a cross-dimension
equality), Q14 (conditional-ratio global aggregate over a broadcast flag),
Q18 (HAVING on a fact-side aggregate), a log-bucketed corpus length
histogram, and distributed PCA over the embedding column. Oracle-compared
vs DuckDB in-process with the same sorted-column compare the driver runs;
PCA is independently recomputed with full-matrix numpy."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

WAVE5_ORACLE = [
    "local_supplier_revenue",
    "promo_revenue_share",
    "large_volume_customers",
    "doc_length_histogram",
    "price_mad",
    "top_terms_by_lang",
    "revenue_daily_growth",
    "part_supplier_counts",
    "customers_only_f_orders",
    "docs_source_share",
    "events_zscore_outliers",
    "discount_revenue_effect",
    "small_quantity_part_revenue",
    "nation_market_share",
    "returned_revenue_customers",
    "top_supplier",
    "banded_brand_revenue",
    "revenue_ewma",
    "revenue_streaks",
]


def _oracle(sql: str, sf: str = SF) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(obj) -> pd.DataFrame:
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE5_ORACLE)
def test_wave5_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = _norm(entrymod.queries()[name](SF))
    orc = _norm(_oracle(entrymod.oracle_sql()[name]))
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_large_volume_customers_is_top20_deterministic(ray_session):
    """Ties on o_totalprice must break by o_orderkey — two runs identical."""
    from ieps_crawler_ray.pipelines.analytics import q_large_volume_customers

    a = q_large_volume_customers(SF)
    b = q_large_volume_customers(SF)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 20
    assert a["o_totalprice"].is_monotonic_decreasing


def test_price_mad_matches_numpy_selection(ray_session):
    """The two histogram selections must pick the exact quantile_disc ranks
    a driver-side sort would: median = sorted[ (n-1)//2 ], MAD likewise over
    |x − median|."""
    import pyarrow.parquet as pq

    from ieps_crawler_ray.pipelines.analytics import q_price_mad

    got = q_price_mad(SF)
    x = np.sort(
        pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])[
            "o_totalprice"
        ].to_numpy()
    )
    med = x[(len(x) - 1) // 2]
    mad = np.sort(np.abs(x - med))[(len(x) - 1) // 2]
    assert got["median_price"][0] == round(float(med), 4)
    assert got["mad_price"][0] == round(float(mad), 4)


def test_histogram_select_property(ray_session):
    """The iterative histogram rank selection must equal a plain sort-index
    for adversarial value distributions: duplicates, near-boundary clusters,
    extreme ranks."""
    import ray.data as rd
    import pyarrow as pa

    from ieps_crawler_ray.pipelines.analytics import _histogram_select

    rng = np.random.RandomState(11)
    cases = [
        rng.uniform(-1e6, 1e6, size=5000),                      # smooth
        np.repeat(rng.uniform(0, 100, size=7), 700),            # heavy ties
        np.concatenate([np.full(3000, 42.0), rng.normal(42.0, 1e-9, 2000)]),
        rng.exponential(1.0, size=4001) ** 4,                   # extreme skew
    ]
    for vals in cases:
        ds = rd.from_arrow(pa.table({"v": vals})).repartition(7)
        srt = np.sort(vals)
        n = len(vals)
        for rank in (0, 1, n // 2, n - 2, n - 1):
            got = _histogram_select(ds, "v", rank, float(vals.min()), float(vals.max()))
            assert got == srt[rank], (rank, got, srt[rank])


def test_embedding_pca_matches_full_matrix_numpy(ray_session):
    """The distributed covariance (per-batch n/Σx/Σxxᵀ partials) must agree
    with a single-matrix numpy eigendecomposition of the same rows."""
    import pyarrow.parquet as pq

    from ieps_crawler_ray.pipelines.analytics import q_embedding_pca

    got = q_embedding_pca(SF)
    x = np.array(
        pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    want = evals / evals.sum()
    assert list(got["component"]) == [0, 1, 2, 3]
    np.testing.assert_allclose(
        got["explained_variance_ratio"].to_numpy(), want[:4], atol=1e-6
    )
    # evr is a distribution: positive, descending, ≤ 1
    assert (got["explained_variance_ratio"] > 0).all()
    assert got["explained_variance_ratio"].is_monotonic_decreasing

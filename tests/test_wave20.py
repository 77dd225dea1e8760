"""Wave-20 gates: per-customer median reorder interval histogram, daily
lag-1 autocorrelation and weekday seasonality vs their DuckDB oracles at
sf0.001, plus a plain-pandas median recompute."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE20 = ["reorder_interval_median_hist", "events_daily_autocorr", "orders_by_weekday"]


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(entrymod.oracle_sql()[name]).df()


@pytest.mark.parametrize("name", WAVE20)
def test_wave20_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle(name)
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_median_hist_recompute(ray_session):
    """pandas groupby median per customer — independent of the segment
    index-arithmetic kernel."""
    from ieps_crawler_ray.pipelines.analytics import q_reorder_interval_median_hist

    got = q_reorder_interval_median_hist(SF)
    df = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).to_pandas()
    df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    df["gap"] = (
        df.groupby("o_custkey")["o_orderdate"].diff().dt.total_seconds() / 86400.0
    )
    med = df.dropna(subset=["gap"]).groupby("o_custkey")["gap"].median().round(2)
    vc = med.value_counts().sort_index()
    want = pd.DataFrame(
        {"median_days": vc.index.to_numpy(), "n_customers": vc.to_numpy()}
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )

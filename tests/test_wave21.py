"""Wave-21 gate: two-sample KS statistic vs its DuckDB oracle at sf0.001
plus an independent full-sort numpy recompute (no bucket machinery)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ks_matches_oracle(ray_session):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()["price_ks_returned"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["price_ks_returned"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_ks_bruteforce(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_price_ks_returned

    got = float(q_price_ks_returned(SF)["ks"].iloc[0])
    df = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_extendedprice", "l_returnflag"]
    ).to_pandas()
    a = np.sort(df.loc[df["l_returnflag"] == "R", "l_extendedprice"].to_numpy())
    b = np.sort(df.loc[df["l_returnflag"] != "R", "l_extendedprice"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    ks = float(np.abs(fa - fb).max())
    assert abs(got - ks) < 1e-6

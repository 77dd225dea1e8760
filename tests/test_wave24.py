"""Wave-24 gate: quality audit, Gini, Mann–Whitney U, max drawdown and TTR
histogram vs their DuckDB oracles at sf0.001, plus independent numpy
recomputes for the rank statistics (no bucket machinery)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = [
    "lineitem_quality_audit",
    "revenue_gini",
    "price_mannwhitney",
    "revenue_max_drawdown",
    "doc_ttr_buckets",
]

TABLES = ["lineitem", "part", "orders", "documents"]


def _oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE)
def test_wave24_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_mannwhitney_bruteforce(ray_session):
    """Tie-averaged rank-sum recomputed with a plain argsort (no buckets)."""
    from ieps_crawler_ray.pipelines.analytics import q_price_mannwhitney

    got = q_price_mannwhitney(SF)
    df = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_extendedprice", "l_returnflag"]
    ).to_pandas()
    x = df["l_extendedprice"].to_numpy()
    g = (df["l_returnflag"] == "R").to_numpy()
    order = np.argsort(x, kind="stable")
    xs = x[order]
    ranks = np.empty(len(xs))
    starts = np.flatnonzero(np.r_[True, xs[1:] != xs[:-1]])
    lens = np.diff(np.r_[starts, len(xs)])
    ranks = np.repeat(starts + 1 + (lens - 1) / 2.0, lens)
    r1 = float(ranks[g[order]].sum())
    n1 = float(g.sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert abs(float(got["u1"].iloc[0]) - u1) < 1e-6


def test_gini_bruteforce(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_revenue_gini

    got = float(q_revenue_gini(SF)["gini"].iloc[0])
    df = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]).to_pandas()
    t = df.groupby("o_custkey")["o_totalprice"].sum().reset_index()
    t = t.sort_values(["o_totalprice", "o_custkey"])
    x = t["o_totalprice"].to_numpy()
    i = np.arange(1, len(x) + 1)
    gini = 2.0 * (i * x).sum() / (len(x) * x.sum()) - (len(x) + 1) / len(x)
    assert abs(got - gini) < 1e-5
    assert 0.0 <= got <= 1.0

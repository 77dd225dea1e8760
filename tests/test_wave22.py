"""Wave-22 gate: nation-pair trade (Q7), part profit (Q9), association
rules, embedding range search, normalized dedup and the source×lang chi²
statistic vs their DuckDB oracles at sf0.001, plus independent recomputes
for the non-SQL-trivial kernels."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = [
    "nation_pair_trade",
    "part_profit_by_year",
    "association_rules",
    "embedding_range_search",
    "normalized_dedup_docs",
    "source_lang_chi2",
]

TABLES = [
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "nation",
    "part",
    "documents",
    "embeddings",
]


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
def test_wave22_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_chi2_bruteforce(ray_session):
    """Independent numpy recompute of the chi² statistic (no Ray plumbing)."""
    from ieps_crawler_ray.pipelines.analytics import q_source_lang_chi2

    got = q_source_lang_chi2(SF)
    df = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"]).to_pandas()
    obs = pd.crosstab(df["source"], df["lang"]).to_numpy(dtype=np.float64)
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert abs(float(got["chi2"].iloc[0]) - chi2) < 1e-5
    assert int(got["dof"].iloc[0]) == (obs.shape[0] - 1) * (obs.shape[1] - 1)


def test_association_rules_lift_sane(ray_session):
    """Lift/confidence invariants: conf ∈ (0,1], lift > 0, support ≥ 3."""
    from ieps_crawler_ray.pipelines.analytics import q_association_rules

    out = q_association_rules(SF)
    assert (out["n_ab"] >= 3).all()
    assert ((out["conf_ab"] > 0) & (out["conf_ab"] <= 1)).all()
    assert (out["lift"] > 0).all()
    # sorted by lift descending with deterministic tiebreak
    assert (out["lift"].to_numpy()[:-1] >= out["lift"].to_numpy()[1:] - 1e-12).all()

"""Wave-28 gate: IQR outlier fences, one-way ANOVA F and LLR keyness vs
their DuckDB oracles at sf0.001, plus an independent ANOVA recompute."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = ["price_iqr_outliers", "doc_length_anova", "terms_llr_keyness"]

TABLES = ["lineitem", "documents"]


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
def test_wave28_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_anova_bruteforce(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_doc_length_anova

    got = float(q_doc_length_anova(SF)["f_stat"].iloc[0])
    df = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "n_chars"]).to_pandas()
    x = df["n_chars"].to_numpy(dtype=np.float64)
    mean = x.mean()
    groups = [g.to_numpy(dtype=np.float64) for _, g in df.groupby("lang")["n_chars"]]
    k, n = len(groups), len(x)
    ssb = sum(len(g) * (g.mean() - mean) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(got - f) < 1e-4

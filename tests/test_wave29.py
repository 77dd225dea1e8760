"""Wave-29 gate: term burstiness, Jensen-Shannon source divergence and
Adamic-Adar link prediction vs their DuckDB oracles at sf0.001, plus an
independent JSD recompute."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = ["doc_burstiness", "doc_js_divergence", "copurchase_adamic_adar"]

TABLES = ["documents", "lineitem"]


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
def test_wave29_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_jsd_bruteforce(ray_session):
    """JSD bounds (0 ≤ JSD ≤ ln 2) and a direct numpy recompute."""
    from ieps_crawler_ray.pipelines.analytics import q_doc_js_divergence

    got = float(q_doc_js_divergence(SF)["jsd"].iloc[0])
    df = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"]).to_pandas()
    from collections import Counter

    ca, cb = Counter(), Counter()
    for src, text in zip(df["source"], df["text"]):
        (ca if src == "src0" else cb).update(text.split(" "))
    vocab = sorted(set(ca) | set(cb))
    a = np.array([ca[t] for t in vocab], dtype=np.float64)
    b = np.array([cb[t] for t in vocab], dtype=np.float64)
    p, q = a / a.sum(), b / b.sum()
    m = (p + q) / 2
    kl = lambda x: float(np.where(x > 0, x * np.log(np.maximum(x, 1e-300) / m), 0).sum())
    jsd = 0.5 * kl(p) + 0.5 * kl(q)
    assert abs(got - jsd) < 1e-5
    assert 0.0 <= got <= np.log(2) + 1e-9

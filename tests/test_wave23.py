"""Wave-23 gate: PMI collocations, AND-retrieval division, bounded BFS
frontier expansion, grouped percent_rank and the Zipf slope vs their DuckDB
oracles at sf0.001, plus an independent BFS recompute on raw pandas."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = [
    "pmi_bigrams",
    "docs_matching_all_terms",
    "copurchase_bfs",
    "supplier_pctrank_nation",
    "doc_zipf_slope",
]

TABLES = ["lineitem", "supplier", "nation", "documents"]


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
def test_wave23_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_bfs_bruteforce(ray_session):
    """Independent BFS recompute over the raw co-purchase edge set."""
    from ieps_crawler_ray.pipelines.analytics import q_copurchase_bfs

    got = q_copurchase_bfs(SF)
    d = (
        pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        .to_pandas()
        .drop_duplicates()
    )
    seed = int(d["l_partkey"].min())
    visited, frontier = {seed}, {seed}
    expect = [1]
    for _ in range(3):
        hit_orders = set(d.loc[d["l_partkey"].isin(frontier), "l_orderkey"])
        nxt = set(d.loc[d["l_orderkey"].isin(hit_orders), "l_partkey"]) - visited
        expect.append(len(nxt))
        visited |= nxt
        frontier = nxt
    assert got["n"].tolist() == expect


def test_pctrank_bounds(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_supplier_pctrank_nation

    out = q_supplier_pctrank_nation(SF)
    assert ((out["pr"] >= 0) & (out["pr"] <= 1)).all()
    # single-supplier nations rank 0 by PERCENT_RANK definition
    singles = out.groupby("n_name").filter(lambda g: len(g) == 1)
    assert (singles["pr"] == 0).all()

"""Wave-27 gate: fact-scale grouped percent_rank, co-purchase link
prediction, cohort LTV matrix and the Benford audit vs their DuckDB oracles
at sf0.001, plus an independent dense-matrix recompute of the
common-neighbour counts."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = [
    "doc_quality_pctrank",
    "copurchase_link_prediction",
    "customer_cohort_ltv",
    "orders_benford",
]

TABLES = ["documents", "lineitem", "orders"]


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
def test_wave27_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_link_prediction_dense_recompute(ray_session):
    """Common-neighbour counts recomputed with a dense A@A (parts are
    dimension-bounded at this sf) — validates the wedge-shuffle plan."""
    from ieps_crawler_ray.pipelines.analytics import q_copurchase_link_prediction

    got = q_copurchase_link_prediction(SF)
    d = (
        pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        .to_pandas()
        .drop_duplicates()
    )
    parts = np.sort(d["l_partkey"].unique())
    idx = {p: i for i, p in enumerate(parts)}
    n = len(parts)
    A = np.zeros((n, n), dtype=np.float32)
    for _, grp in d.groupby("l_orderkey"):
        ps = [idx[p] for p in grp["l_partkey"]]
        for i in ps:
            for j in ps:
                if i != j:
                    A[i, j] = 1.0
    C = (A @ A).astype(np.int64)
    cand = []
    for i in range(n):
        for j in range(i + 1, n):
            if A[i, j] == 0 and C[i, j] > 0:
                cand.append((int(C[i, j]), int(parts[i]), int(parts[j])))
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = pd.DataFrame(cand[:10], columns=["common", "part_a", "part_b"])
    pd.testing.assert_frame_equal(
        got[["common", "part_a", "part_b"]].reset_index(drop=True),
        expect,
        check_dtype=False,
    )

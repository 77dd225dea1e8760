"""Wave-17 gates: grouped regression, global bigram top-k, asymmetric
containment dedup pairs, Pareto supplier concentration — each vs its DuckDB
oracle at sf0.001, plus an independent set-algebra recompute of containment."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE17_SQL = [
    "price_qty_regression",
    "top_bigrams",
    "docs_containment_pairs",
    "suppliers_pareto_80",
]


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(entrymod.oracle_sql()[name]).df()


@pytest.mark.parametrize("name", WAVE17_SQL)
def test_wave17_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle(name)
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_containment_bruteforce(ray_session):
    """Python-set recompute of the gram-bucket plan: distinct 8-token window
    sets per doc, pairwise intersection over min size."""
    from ieps_crawler_ray.pipelines.analytics import q_docs_containment_pairs

    got = q_docs_containment_pairs(SF)
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    grams = {}
    for _, r in df.iterrows():
        toks = r["text"].split(" ")
        grams[int(r["doc_id"])] = {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        }
    ids = sorted(grams)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(grams[a] & grams[b])
            if inter and inter / min(len(grams[a]), len(grams[b])) >= 0.5:
                rows.append(
                    {
                        "id_a": a,
                        "id_b": b,
                        "containment": round(inter / min(len(grams[a]), len(grams[b])), 6),
                    }
                )
    want = pd.DataFrame(rows, columns=["id_a", "id_b", "containment"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_regression_recompute(ray_session):
    """np.polyfit per flag must agree with the two-pass moments to 1e-6."""
    from ieps_crawler_ray.pipelines.analytics import q_price_qty_regression

    got = q_price_qty_regression(SF).set_index("l_returnflag")
    df = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    for flag, g in df.groupby("l_returnflag"):
        slope, intercept = np.polyfit(g["l_quantity"], g["l_extendedprice"], 1)
        assert abs(got.loc[flag, "slope"] - slope) < 1e-5
        assert abs(got.loc[flag, "intercept"] - intercept) < 1e-4

"""Round-4 wave-12 operators: the EXISTS / strictly-last semi-join TPC-H
shapes (Q4 late-ship priority counts, Q12 priority-class line counts, Q21
strictly-last shipper) — oracle-compared vs DuckDB in-process with the same
sorted-column compare the driver runs, plus a degenerate-edge unit for the
Q21 per-bucket segmented scan (ties at the max must NOT win; single-supplier
orders are excluded)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

WAVE12_ORACLE = [
    "late_ship_orders",
    "lines_by_priority_class",
    "waiting_suppliers",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(obj) -> pd.DataFrame:
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("name", WAVE12_ORACLE)
def test_wave12_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = _norm(entrymod.queries()[name](SF))
    orc = _norm(_oracle(entrymod.oracle_sql()[name]))
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_waiting_suppliers_tie_and_singleton_edges(tmp_path, ray_session):
    """Synthetic 4-order corpus: a two-way tie at the max (no winner), a
    clean strictly-last winner, a single-supplier order (excluded even
    though its line is trivially last), and an order whose max is shared by
    the same supplier twice (still one distinct supplier at max → wins)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ieps_crawler_ray.pipelines.analytics import q_waiting_suppliers

    d = np.datetime64("2020-01-01", "ns")
    day = np.timedelta64(1, "D")
    rows = {
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4, 4],
        "l_suppkey": [10, 20, 10, 20, 10, 30, 30, 20],
        "l_shipdate": [
            d + 5 * day, d + 5 * day,   # order 1: tie at max → nobody wins
            d + 1 * day, d + 9 * day,   # order 2: supp 20 strictly last
            d + 3 * day,                # order 3: single supplier → excluded
            d + 7 * day, d + 7 * day, d + 2 * day,  # order 4: supp 30 wins
        ],
    }
    pq.write_table(pa.table(rows), str(tmp_path / "lineitem.parquet"))
    supp = pa.table(
        {"s_suppkey": [10, 20, 30], "s_name": ["S_A", "S_B", "S_C"],
         "s_nationkey": [0, 0, 0], "s_acctbal": [0.0, 0.0, 0.0]}
    )
    pq.write_table(supp, str(tmp_path / "supplier.parquet"))

    out = q_waiting_suppliers(str(tmp_path))
    got = dict(zip(out["s_name"], out["numwait"]))
    assert got == {"S_B": 1, "S_C": 1}

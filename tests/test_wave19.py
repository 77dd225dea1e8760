"""Wave-19 gates: event-sequence trigram mining and RFM tercile segmentation
vs their DuckDB oracles at sf0.001, plus a plain-python trigram recompute and
an NTILE remainder-rule unit check."""

from __future__ import annotations

import collections

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(entrymod.oracle_sql()[name]).df()


@pytest.mark.parametrize("name", ["top_event_trigrams", "orders_rfm_segments"])
def test_wave19_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle(name)
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_trigram_bruteforce(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_top_event_trigrams

    got = q_top_event_trigrams(SF)
    df = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).to_pandas()
    counts: collections.Counter = collections.Counter()
    for _, g in df.groupby("user_id"):
        et = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        for i in range(len(et) - 2):
            counts[f"{et[i]}>{et[i+1]}>{et[i+2]}"] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["trigram"], got["n"])) == want


def test_ntile3_remainder_rule():
    """SQL NTILE hands the first (n mod k) tiles one extra row."""
    from ieps_crawler_ray.pipelines.analytics import _ntile3

    vals = np.array([50, 40, 30, 20, 10, 5, 1], dtype=np.int64)  # desc by -vals
    ids = np.arange(7, dtype=np.int64)
    tiles = _ntile3([-vals, ids], 7)
    # 7 rows → tiles of size 3, 2, 2 in value-descending order
    assert tiles.tolist() == [1, 1, 1, 2, 2, 3, 3]

"""Wave-25 gate: monthly churn, near-dup source matrix, winsorized mean and
sliding event-time windows vs their DuckDB oracles at sf0.001, plus an
independent sliding-window recompute."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

WAVE = [
    "monthly_churn",
    "neardup_rate_by_source",
    "events_value_winsorized_mean",
    "events_sliding_30d_revenue",
]

TABLES = ["events", "documents"]


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
def test_wave25_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle_con().execute(entrymod.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_norm(mine), _norm(orc), check_dtype=False)


def test_sliding_window_bruteforce(ray_session):
    """Each purchase lands in exactly the windows [s, s+28) with s on the
    7-day grid — recomputed by direct interval membership."""
    from ieps_crawler_ray.pipelines.analytics import q_events_sliding_30d_revenue

    got = q_events_sliding_30d_revenue(SF)
    df = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    df = df[df["event_type"] == "purchase"]
    epoch = np.datetime64("1995-01-01")
    days = (df["ts"].to_numpy().astype("datetime64[D]") - epoch).astype(np.int64)
    vals = df["value"].to_numpy()
    acc: dict[int, float] = {}
    smax = int(days.max() // 7) * 7
    for s in range(0, smax + 7, 7):
        m = (days >= s) & (days < s + 28)
        if m.any():
            acc[s] = float(vals[m].sum())
    expect = pd.DataFrame(
        {
            "win_start": [str(epoch + np.timedelta64(s, "D")) for s in sorted(acc)],
            "revenue": [round(acc[s], 4) for s in sorted(acc)],
        }
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), expect, check_dtype=False)

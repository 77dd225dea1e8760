"""Round-4 wave-11 operators: the remaining feasible TPC-H shapes (Q7
bilateral trade, Q13 order-count histogram, Q22 idle-rich anti-join) and the
sliding-window COUNT DISTINCT — oracle-compared vs DuckDB in-process with the
same sorted-column compare the driver runs. Also pins the round-4 rewrites
(as-of join and first-event on the ub-bucket segmented-scan shape) and the
ADVICE r3 guards."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

WAVE11_ORACLE = [
    "nation_trade_volume",
    "customer_order_histogram",
    "idle_rich_customers",
    "distinct_users_sliding7",
    # round-4 rewrites / guards — re-pinned here at sf0.001
    "purchase_asof_click",
    "first_event_per_user",
    "top_supplier",
    "events_zscore_outliers",
    "doc_length_histogram",
    "promo_revenue_share",
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


@pytest.mark.parametrize("name", WAVE11_ORACLE)
def test_wave11_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = _norm(entrymod.queries()[name](SF))
    orc = _norm(_oracle(entrymod.oracle_sql()[name]))
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_broadcast_join_empty_dimension(ray_session):
    """BroadcastLookup with a zero-row dimension must act as an all-null
    left join instead of indexing an empty key array (wave-11 regression:
    Q7's nation filter can empty the supplier dim at tiny scale)."""
    import pyarrow as pa
    import ray.data as rd

    from ieps_crawler_ray.pipelines.joins import broadcast_join

    ds = rd.from_arrow(pa.table({"k": [1, 2, 3]}))
    dim = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.string())})
    out = broadcast_join(ds, dim, "k", ["v"]).to_pandas()
    assert len(out) == 3 and out["v"].isna().all()

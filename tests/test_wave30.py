"""Wave-30 gate: hapax/lexical-richness scalars vs the DuckDB oracle at
sf0.001 plus a direct Counter recompute."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_hapax_oracle(ray_session):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()["doc_hapax_ratio"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["doc_hapax_ratio"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_hapax_bruteforce(ray_session):
    from collections import Counter

    from ieps_crawler_ray.pipelines.analytics import q_doc_hapax_ratio

    got = q_doc_hapax_ratio(SF)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    c = Counter()
    for t in texts:
        c.update(t.split(" "))
    hapax = sum(1 for v in c.values() if v == 1)
    assert int(got["n_hapax"].iloc[0]) == hapax
    assert int(got["n_vocab"].iloc[0]) == len(c)
    assert abs(float(got["hapax_ratio"].iloc[0]) - round(hapax / len(c), 6)) < 1e-9

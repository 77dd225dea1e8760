"""Wave-26 gate: 1-NN label agreement vs its quadratic DuckDB oracle, and
MMR greedy-rerank invariants (the exact values are md5-pinned in
test_golden_values)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_knn_agreement_oracle(ray_session):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()["knn_label_agreement"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["knn_label_agreement"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_mmr_greedy_bruteforce(ray_session):
    """Re-run the greedy on a locally computed candidate pool and require the
    identical selection sequence."""
    from ieps_crawler_ray.pipelines.analytics import q_mmr_diverse_topk

    got = q_mmr_diverse_topk(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.array(t.loc[t["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    t = t[t["vec_id"] != 0]
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ qn
    order = np.lexsort((ids, -sims))[:50]
    ids, mat, sims = ids[order], mat[order], sims[order]

    chosen, cand = [], np.arange(len(ids))
    max_sel = np.zeros(len(ids))
    seq = []
    for _ in range(10):
        score = 0.7 * sims[cand] - (0.0 if not chosen else 0.3) * max_sel[cand]
        bp = np.lexsort((ids[cand], -score))[0]
        pick = cand[bp]
        seq.append(int(ids[pick]))
        chosen.append(pick)
        cand = cand[cand != pick]
        max_sel[cand] = np.maximum(max_sel[cand], mat[cand] @ mat[pick])
    assert got["vec_id"].tolist() == seq
    # the MMR sequence must start at the plain-cosine argmax
    assert seq[0] == int(ids[0])

"""Round-3 wave-4 operators: BPE pair counting, cross-document paragraph
dedup, and the composite curation chain — oracle-compared vs DuckDB
in-process with the same sorted-column compare the driver runs."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

WAVE4_ORACLE = [
    "bpe_pair_counts",
    "curated_corpus_stats",
    "shared_paragraphs",
    "dedup_clusters_labelprop",
    "embedding_topk_int8",
    "fuzzy_name_pairs",
    "doc_lm_scores",
    "copurchase_triangles",
    "docs_shuffle_head",
    "session_durations",
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
    return df[sorted(df.columns)].reset_index(drop=True)


@pytest.mark.parametrize("name", WAVE4_ORACLE)
def test_wave4_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = _norm(entrymod.queries()[name](SF))
    orc = _norm(_oracle(entrymod.oracle_sql()[name]))
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_triangles_shuffle_fallback_matches_broadcast(ray_session, monkeypatch):
    """Force the pair-keyed-shuffle membership plan (edge count above a
    1-edge broadcast cap) and pin it to the broadcast plan's answer — both
    physical plans must agree on the same graph (VERDICT r3 item 5)."""
    from ieps_crawler_ray.pipelines.analytics import q_copurchase_triangles

    bcast = q_copurchase_triangles(SF)
    monkeypatch.setenv("IEPS_TRI_BCAST_MAX_EDGES", "1")
    shuffled = q_copurchase_triangles(SF)
    pd.testing.assert_frame_equal(bcast, shuffled)
    assert int(bcast["n_triangles"].iloc[0]) > 0  # non-degenerate graph


def test_curated_corpus_dedup_winner_is_first(ray_session):
    """The packed-code Min must pick the MIN doc_id per content hash: the
    curated totals must match a direct pandas recompute of first-wins +
    token-window filtering."""
    import pyarrow.parquet as pq

    from ieps_crawler_ray.functions import hashing, text as textfn
    from ieps_crawler_ray.pipelines.analytics import q_curated_corpus_stats

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])
    df = t.to_pandas().sort_values("doc_id")
    df["h"] = hashing.md5_hex(df["text"].tolist())
    df["n_tokens"] = textfn.token_counts(df["text"].tolist())
    win = df.drop_duplicates("h", keep="first")
    win = win[(win["n_tokens"] >= 30) & (win["n_tokens"] <= 80)]
    exp = (
        win.groupby("lang")
        .agg(n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    got = q_curated_corpus_stats(SF)
    pd.testing.assert_frame_equal(got, exp.astype({"n_docs": "int64", "total_tokens": "int64"}), check_dtype=False)

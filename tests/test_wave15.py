"""Wave-15 gates: temporal range self-join (repeat_orders_7d), ordered-set
string aggregation (lang_sources_concat), global-median broadcast composite
(nation_spend_above_median) — each vs its DuckDB oracle — plus an
independent brute-force recompute of the range-join pair counts and of the
cross-modal caption/image consistency miner."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(entrymod.oracle_sql()[name]).df()


@pytest.mark.parametrize(
    "name", ["repeat_orders_7d", "lang_sources_concat", "nation_spend_above_median"]
)
def test_wave15_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    orc = _oracle(name)
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_repeat_orders_7d_matches_bruteforce(ray_session):
    """Independent O(n² per customer) pair count — no shared kernel with the
    merged-lexsort implementation."""
    from ieps_crawler_ray.pipelines.analytics import q_repeat_orders_7d

    got = q_repeat_orders_7d(SF)
    df = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    ).to_pandas()
    W = np.timedelta64(7 * 86_400_000_000, "us")
    counts: dict[int, int] = {}
    for ck, g in df.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        ts = g["o_orderdate"].to_numpy()
        n_pairs = 0
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                if ts[j] <= ts[i] + W:
                    n_pairs += 1
        if n_pairs:
            counts[int(ck)] = n_pairs
    vals, cnts = np.unique(np.array(sorted(counts.values())), return_counts=True)
    want = pd.DataFrame(
        {"n_pairs": vals.astype(np.int64), "n_customers": cnts.astype(np.int64)}
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert want["n_customers"].sum() > 0  # the corpus gives the op real signal


def test_caption_image_consistency_matches_bruteforce(ray_session):
    """All-pairs word-set Jaccard + phash hamming over the sf0.001 Lance
    corpus vs the banded-LSH miner."""
    from ieps_crawler_ray.functions.hashing import hamming64
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        _corpus,
        _spec_for_sf,
        q_caption_image_consistency,
    )
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_caption_image_consistency(SF)
    t = lt.read_pyarrow(
        _corpus(_spec_for_sf(SF)), columns=["image_id", "caption", "phash"]
    )
    ids = np.array([int(s[3:]) for s in t["image_id"].to_pylist()], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    caps = [set(c.split()) for c in np.asarray(t["caption"].to_pylist())[order]]
    ph = t["phash"].to_numpy()[order].view(np.uint64)
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(caps[i] & caps[j])
            if inter == 0:
                continue
            jac = inter / len(caps[i] | caps[j])
            if jac >= 0.8:
                rows.append(
                    (
                        ids[i],
                        ids[j],
                        round(jac, 4),
                        int(hamming64(ph[i : i + 1], ph[j : j + 1])[0]),
                    )
                )
    want = pd.DataFrame(
        rows, columns=["id_a", "id_b", "jaccard", "phash_hamming"]
    ).astype({"id_a": "int64", "id_b": "int64", "phash_hamming": "int64"})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert len(want) > 0  # planted one-word-edit captions give real signal


def test_purchase_next_click_matches_oracle(ray_session):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()["purchase_next_click"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["purchase_next_click"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )
    assert mine["n_matched"].sum() > 0


def test_image_dedup_manifest_matches_recompute(ray_session):
    """Re-derive the manifest from the pair list + a direct corpus read —
    independent BFS components, no shared union-find code."""
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        _corpus,
        _spec_for_sf,
        q_image_dedup_manifest,
        q_image_phash_neardup,
    )
    from ieps_crawler_ray.sources import corpus as C
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_image_dedup_manifest(SF)
    edges = q_image_phash_neardup(SF)
    adj: dict[int, set] = {}
    for a, b in zip(edges["id_a"], edges["id_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    seen: set = set()
    drop: set = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, todo = set(), [start]
        while todo:
            x = todo.pop()
            if x in comp:
                continue
            comp.add(x)
            todo.extend(adj[x] - comp)
        seen |= comp
        drop |= comp - {min(comp)}
    spec = _spec_for_sf(SF)
    spec = C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})
    t = lt.read_pyarrow(_corpus(spec), columns=["image_id", "fmt", "w", "h"]).to_pandas()
    t["iid"] = [int(s[3:]) for s in t["image_id"]]
    t["dropped"] = t["iid"].isin(drop)
    t["px"] = t["w"].astype("int64") * t["h"].astype("int64") * 3
    want = (
        t.groupby("fmt")
        .apply(
            lambda g: pd.Series(
                {
                    "n_images": len(g),
                    "n_dropped": int(g["dropped"].sum()),
                    "px_bytes_saved": int(g.loc[g["dropped"], "px"].sum()),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .astype({"n_images": "int64", "n_dropped": "int64", "px_bytes_saved": "int64"})
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert want["n_dropped"].sum() > 0

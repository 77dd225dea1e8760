"""Wave-14 gates: BM25 retrieval, CCNet perplexity terciles, Rabin-CDC
chunk dedup. Each distributed result is re-derived with an independent
single-process implementation over the same sf0.001 tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs(columns):
    return pq.read_table(f"{SF}/documents.parquet", columns=columns).to_pandas()


# ----------------------------------------------------------- CDC kernel ----


def test_cdc_chunks_matches_pure_python_recompute():
    from ieps_crawler_ray.functions.hashing import _CDC_P, cdc_chunks, splitmix64

    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 3000, dtype=np.uint64)
    cuts, hs = cdc_chunks(data)
    w, P, M = 16, int(_CDC_P), 1 << 64
    # boundaries: window hash of the trailing 16 bytes ≡ 0 (mod 64)
    ref_cuts = []
    for i in range(w - 1, len(data)):
        h = 0
        for k in range(w):
            h = (h + int(data[i - k]) * pow(P, k, M)) % M
        if int(splitmix64(np.uint64(h))[0]) % 64 == 0:
            ref_cuts.append(i + 1)
    if not ref_cuts or ref_cuts[-1] != len(data):
        ref_cuts.append(len(data))
    assert list(cuts) == ref_cuts
    # per-chunk hashes: polynomial hash of the chunk content, mixed + length-xored
    for i, end in enumerate(cuts):
        a = 0 if i == 0 else cuts[i - 1]
        seg = data[a:end]
        h = 0
        for j, byte in enumerate(seg):
            h = (h + int(byte) * pow(P, len(seg) - 1 - j, M)) % M
        want = int(splitmix64(np.uint64(h))[0]) ^ int(splitmix64(np.uint64(len(seg)))[0])
        assert int(hs[i]) == want


def test_cdc_chunks_content_defined_and_offset_independent():
    from ieps_crawler_ray.functions.hashing import cdc_chunks

    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 4000, dtype=np.uint64)
    cuts, hs = cdc_chunks(data)
    # a prefix insertion shifts all boundaries by exactly the insert length
    # (content-defined: no boundary is positional)
    prefix = rng.integers(0, 256, 137, dtype=np.uint64)
    cuts2, hs2 = cdc_chunks(np.concatenate([prefix, data]))
    assert set(np.asarray(cuts) + 137) <= set(np.asarray(cuts2))
    # identical chunk content at different offsets hashes identically: the
    # shifted stream's tail chunks reuse the original hashes
    tail = [int(h) for h in hs[1:]]  # first original chunk may merge w/ prefix
    assert set(tail) <= set(int(h) for h in hs2)


def test_cdc_chunks_degenerate_inputs():
    from ieps_crawler_ray.functions.hashing import cdc_chunks

    cuts, hs = cdc_chunks(np.empty(0, dtype=np.uint64))
    assert list(cuts) == [0] and len(hs) == 1
    cuts, hs = cdc_chunks(np.array([65, 66, 67], dtype=np.uint64))  # < window
    assert list(cuts) == [3] and len(hs) == 1


def test_cdc_chunk_stats_vs_recompute(ray_session):
    from collections import defaultdict

    from ieps_crawler_ray.functions.hashing import cdc_chunks
    from ieps_crawler_ray.pipelines.analytics import q_cdc_chunk_stats

    got = q_cdc_chunk_stats(SF).set_index("lang")
    docs = _docs(["lang", "text"])
    tot, dist, lsum = defaultdict(int), defaultdict(set), defaultdict(int)
    for lg, t in zip(docs["lang"], docs["text"]):
        raw = np.frombuffer(t.encode("ascii"), dtype=np.uint8)
        cuts, hs = cdc_chunks(raw)
        tot[lg] += len(cuts)
        lsum[lg] += int(cuts[-1])
        dist[lg].update(int(h) for h in hs)
    for lg in tot:
        assert got.loc[lg, "n_chunks"] == tot[lg]
        assert got.loc[lg, "n_distinct"] == len(dist[lg])
        assert got.loc[lg, "avg_len"] == round(lsum[lg] / tot[lg], 4)


# ---------------------------------------------------------------- BM25 ----


def test_bm25_topk_vs_brute_force(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_bm25_topk

    got = q_bm25_topk(SF)
    docs = _docs(["doc_id", "text"])
    terms = ("dup", "hash", "merge", "scan")
    K1, B = 1.2, 0.75
    words = docs["text"].str.split(" ")
    dl = words.map(len).astype(float)
    n, avgdl = float(len(docs)), float(dl.mean())
    score = np.zeros(len(docs))
    for t in terms:
        tf = words.map(lambda ws, _t=t: ws.count(_t)).astype(float).to_numpy()
        df = float((tf > 0).sum())
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        score += idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl.to_numpy() / avgdl))
    ref = (
        pd.DataFrame({"doc_id": docs["doc_id"], "score": np.round(score, 6)})
        .query("score > 0")
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


# ------------------------------------------------- perplexity terciles ----


def test_perplexity_buckets_exact_ntile_sizes(ray_session):
    from ieps_crawler_ray.pipelines.analytics import q_perplexity_buckets

    got = q_perplexity_buckets(SF)
    n = int(pq.read_metadata(f"{SF}/documents.parquet").num_rows)
    sizes = got.groupby("bucket")["n_docs"].sum()
    assert sizes["head"] == n // 3
    assert sizes["middle"] == (2 * n) // 3 - n // 3
    assert sizes["tail"] == n - (2 * n) // 3
    # head must be the most in-distribution tercile: bucket-mean lp ordering
    m = got.groupby("bucket").apply(
        lambda g: (g["avg_lp"] * g["n_docs"]).sum() / g["n_docs"].sum(),
        include_groups=False,
    )
    assert m["head"] > m["middle"] > m["tail"]


# ------------------------------------------- image pHash cluster recompute ----


def test_image_phash_clusters_matches_bruteforce_components(ray_session):
    """Re-derive the cluster table from the (brute-force-gated) pair list
    with an independent adjacency-set BFS — no shared union-find code."""
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        q_image_phash_clusters,
        q_image_phash_neardup,
    )

    got = q_image_phash_clusters(SF)
    edges = q_image_phash_neardup(SF)
    adj: dict[int, set] = {}
    ham: dict[tuple, int] = {}
    for a, b, h in zip(edges["id_a"], edges["id_b"], edges["hamming"]):
        a, b = int(a), int(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        ham[(a, b)] = int(h)
    seen: set = set()
    rows = []
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
        mx = max(
            ham[(min(a, b), max(a, b))]
            for a in comp
            for b in adj[a]
            if b in comp and a < b
        )
        rows.append((min(comp), len(comp), mx))
    want = pd.DataFrame(
        sorted(rows), columns=["cluster_id", "n_images", "max_hamming"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert (want["n_images"] >= 2).all() and len(want) > 0

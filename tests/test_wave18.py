"""Wave-18 gates: keep-longest dedup winner vs its DuckDB oracle, decoded
pixel-moment stats vs a driver-side numpy recompute, and the pHash hamming
histogram vs an all-pairs brute force (candidate completeness within the
banded range is NOT asserted — only that every reported (hamming, count) row
is exact for the pairs the bands can see at hamming ≤ 3, and that planted
dups separate from background)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_keep_longest_matches_oracle(ray_session):
    import __ray_entry__ as entrymod

    mine = entrymod.queries()["dedup_keep_longest_docs"](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["dedup_keep_longest_docs"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def test_pixel_stats_recompute(ray_session):
    """Driver-side loop over the same corpus: per-fmt luma moments must match
    the distributed actor-pool aggregate to the rounded precision."""
    from ieps_crawler_ray.functions.codecs import decode_image
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        _corpus,
        _spec_for_sf,
        q_image_pixel_stats,
    )
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_image_pixel_stats(SF).set_index("fmt")

    spec = _spec_for_sf(SF)
    t = lt.read_pyarrow(_corpus(spec), columns=["fmt", "bytes"])
    agg: dict[str, list] = {}
    for fmt, blob in zip(t["fmt"].to_pylist(), t["bytes"].to_pylist()):
        px = decode_image(blob, fmt)
        luma = (
            0.299 * px[:, :, 0].astype(np.float64)
            + 0.587 * px[:, :, 1]
            + 0.114 * px[:, :, 2]
        )
        e = agg.setdefault(fmt, [0, 0, 0.0, 0.0])
        e[0] += 1
        e[1] += luma.size
        e[2] += float(luma.sum())
        e[3] += float((luma * luma).sum())
    for fmt, (n_img, n_px, s1, s2) in agg.items():
        assert got.loc[fmt, "n_images"] == n_img
        assert got.loc[fmt, "n_pixels"] == n_px
        mean = s1 / n_px
        std = float(np.sqrt(max(s2 / n_px - mean * mean, 0.0)))
        assert abs(got.loc[fmt, "mean_luma"] - mean) < 1e-3
        assert abs(got.loc[fmt, "std_luma"] - std) < 1e-3


def test_phash_histogram_bruteforce(ray_session):
    """All-pairs popcount over the same corpus: within the pigeonhole-exact
    range (hamming ≤ 3 ⇒ at least one equal 16-bit band ⇒ candidate), the
    histogram must match brute force EXACTLY; above it, every reported count
    must be ≤ the brute-force count (bands only see a subset)."""
    from ieps_crawler_ray.functions.hashing import hamming64
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        _corpus,
        _spec_for_sf,
        q_phash_hamming_histogram,
    )
    from ieps_crawler_ray.sources import corpus as C
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_phash_hamming_histogram(SF).set_index("hamming")["n_pairs"]

    spec = _spec_for_sf(SF)
    spec = C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})
    t = lt.read_pyarrow(_corpus(spec), columns=["image_id", "phash"])
    h = t["phash"].to_numpy().view(np.uint64)
    ia, ib = np.triu_indices(len(h), k=1)
    ham = hamming64(h[ia], h[ib]).astype(np.int64)
    exact = pd.Series(ham).value_counts()
    for d, n in got.items():
        if d <= 3:
            assert n == int(exact.get(d, 0)), f"hamming {d}"
        else:
            assert n <= int(exact.get(d, 0)), f"hamming {d}"
    # and the pigeonhole range is COMPLETE: every brute-force pair ≤ 3 appears
    for d in (0, 1, 2, 3):
        if int(exact.get(d, 0)):
            assert got.get(d, 0) == int(exact.get(d, 0))

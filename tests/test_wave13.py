"""Round-4 wave-13 operators: image-modality pHash near-dup pairs (banded
LSH, pigeonhole-exact at hamming ≤ 3) vs an all-pairs brute force; planted
near-dup-image generator invariants; SemDeDup semantic dedup vs a full numpy
recompute over the same cluster assignment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_gopher_quality_matches_oracle(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    mine = entrymod.queries()["gopher_quality_docs"](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    orc = con.execute(entrymod.oracle_sql()["gopher_quality_docs"]).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), orc.reset_index(drop=True), check_dtype=False
    )


def _dup_spec():
    from ieps_crawler_ray.pipelines.crawl_pipeline import _spec_for_sf
    from ieps_crawler_ray.sources import corpus as C

    spec = _spec_for_sf(SF)
    return C.CorpusSpec(**{**spec.__dict__, "dup_image_permille": 50})


def test_image_phash_neardup_matches_bruteforce(ray_session):
    from ieps_crawler_ray.functions.hashing import hamming64
    from ieps_crawler_ray.pipelines.crawl_pipeline import (
        q_image_phash_neardup,
        _corpus,
    )
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_image_phash_neardup(SF)
    t = lt.read_pyarrow(_corpus(_dup_spec()), columns=["image_id", "phash"])
    ids = np.array([int(s[3:]) for s in t["image_id"].to_pylist()], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    ph = t["phash"].to_numpy()[order].view(np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    ham = hamming64(ph[ia], ph[ib]).astype(np.int64)
    keep = ham <= 3
    want = (
        pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]})
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["id_a", "id_b"]).reset_index(drop=True), want
    )
    assert len(want) > 0  # the planted dups give the op real signal


def test_planted_dup_image_invariants():
    """A planted dup keeps its base's dims and differs in EXACTLY one 16×16
    block of one channel; non-dup indices are byte-identical to the base
    field (dup_image_permille=0 path unchanged)."""
    from ieps_crawler_ray.sources import corpus as C

    spec = _dup_spec()
    n_dup = 0
    for i in range(1, 400):
        r = spec.stream(np.array([i]), 53)[0]
        if int(r % C.U64(1000)) < spec.dup_image_permille:
            n_dup += 1
            j = int(spec.stream(np.array([i]), 54)[0] % C.U64(i))
            px = C.pixels_of_index(spec, i)
            base = C._base_pixels(spec, j)
            assert px.shape == base.shape
            diff = px != base
            ys, xs, cs = np.nonzero(diff)
            assert len(set(cs)) == 1  # one channel
            assert ys.max() - ys.min() < 16 and xs.max() - xs.min() < 16
        else:
            assert np.array_equal(C.pixels_of_index(spec, i), C._base_pixels(spec, i))
    assert n_dup > 0


def test_semantic_dedup_matches_numpy_recompute(ray_session):
    from ieps_crawler_ray.pipelines.analytics import _ivf_index, q_semantic_dedup
    from ieps_crawler_ray.sources import lance_table as lt

    got = q_semantic_dedup(SF).set_index("cluster_id")
    path, _ = _ivf_index(SF)
    total = 0
    for bk in got.index:
        # the bucket column is hive-encoded in the partition dir, not the
        # fragment files — read each partition separately
        g = (
            lt.read_pyarrow(path, columns=["vec_id", "embedding"], partitions=[int(bk)])
            .to_pandas()
            .sort_values("vec_id")
        )
        total += len(g)
        e = np.array(list(g["embedding"]), dtype=np.float64)
        en = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        s = en @ en.T
        dropped = int((np.tril(s, k=-1) >= 0.4).any(axis=1).sum())
        assert got.loc[int(bk), "n"] == len(g)
        assert got.loc[int(bk), "n_dropped"] == dropped
    assert got["n"].sum() == total

"""Crawl-engine pipelines bound to the driver contract (rows-only checks).

These run over the deterministic synthetic corpus (built on demand under
/tmp, keyed by spec — same seed ⇒ same bytes ⇒ reproducible), NOT over the
TPC-H-ish tables, so they have no DuckDB oracle; the parity gate for them is
tests/test_crawl_parity.py against the sequential oracle crawler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.codecs import decode_image, psnr
from ..functions.hashing import phash64
from ..sources import corpus as C
from ..sources import lance_table as lt

SCRATCH = "/tmp/ieps_crawler_ray"

FLAGSHIP_SPEC = C.CorpusSpec(n_images=2_000, n_hosts=16, num_buckets=8)


def _corpus(spec: C.CorpusSpec) -> str:
    return C.build_corpus(spec, C.corpus_path(SCRATCH, spec))


class VerifyImages:
    """Actor-pool stage: decode stored bytes, recompute pHash, check the
    mandated per-row invariant (decoded-pixel allclose / PSNR≥40dB for lossy
    + caption fingerprint) — BASELINE.json input_hint. Stateful setup
    (DCT matrix warm, codec dispatch) happens once per actor."""

    def __init__(self, spec_dict: dict):
        self.spec = C.CorpusSpec(**spec_dict)
        from ..functions.hashing import _dct_matrix

        _dct_matrix(32)  # warm the cached DCT basis

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        fmts = b["fmt"].to_pylist()
        blobs = b["bytes"].to_pylist()
        phs = b["phash"].to_numpy()
        ok_hash = np.zeros(len(ids), dtype=bool)
        psnrs = np.zeros(len(ids), dtype=np.float64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            px = decode_image(blob, fmt)
            ok_hash[i] = phash64(px) == phs[i]
            original = C.pixels_of_index(self.spec, int(ids[i][3:]))
            psnrs[i] = psnr(original, px)
        return pa.table(
            {
                "image_id": b["image_id"],
                "fmt": b["fmt"],
                "phash_ok": pa.array(ok_hash, pa.bool_()),
                "psnr_db": pa.array(psnrs, pa.float64()),
                "psnr_ok": pa.array((psnrs >= 40.0) | np.isinf(psnrs), pa.bool_()),
            }
        )


def verify_images_ds(spec: C.CorpusSpec):
    """read corpus → actor-pool decode/verify — the minimum end-to-end slice
    (SURVEY §7.2): zero-copy Arrow in, small batches for wide binary rows."""
    path = _corpus(spec)
    ds = lt.read_dataset(path, columns=["image_id", "bytes", "fmt", "phash"])
    return ds.map_batches(
        VerifyImages,
        fn_constructor_kwargs={"spec_dict": spec.__dict__.copy()},
        batch_format="pyarrow",
        batch_size=256,  # binary payloads: keep batches small (SURVEY §7.5.7)
        concurrency=(1, 8),
    )


def entry_flagship():
    """Driver smoke entry: verify pipeline at sf0.001-ish scale (2k images)."""
    return verify_images_ds(FLAGSHIP_SPEC)


def _spec_for_sf(sf_dir: str) -> C.CorpusSpec:
    # driver passes a testdata sf dir; map it to a corpus size deterministically
    if "0.1" in sf_dir:
        return C.CorpusSpec(n_images=20_000, n_hosts=64, num_buckets=16)
    if "0.01" in sf_dir:
        return C.CorpusSpec(n_images=5_000, n_hosts=32, num_buckets=8)
    return C.CorpusSpec(n_images=1_000, n_hosts=16, num_buckets=4)


def q_image_verify(sf_dir: str) -> pd.DataFrame:
    """per-fmt verification stats of the corpus (rows-only check)."""
    from ray.data.aggregate import Sum

    ds = verify_images_ds(_spec_for_sf(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "fmt": b["fmt"],
                "ok": pa.compute.cast(
                    pa.compute.and_(b["phash_ok"], b["psnr_ok"]), pa.int64()
                ),
            }
        )
        return t.group_by(["fmt"]).aggregate([("ok", "sum"), ([], "count_all")])

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Sum("ok_sum", alias_name="n_ok"), Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    return out[["fmt", "n", "n_ok"]]


QUERIES = {
    "image_verify": q_image_verify,
}

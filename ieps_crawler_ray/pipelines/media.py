"""Multimodal actor-pool stages over opaque binary media columns.

The media table mirrors the mandated image-table pattern: ``(media_id:string,
kind:string, bytes:binary, meta…)``. Decode is the sandbox stub
(functions/media.py — real codecs slot in behind the same functions); the
Ray plumbing is real: binary columns stay in ``batch_format="pyarrow"``
(pandas would object-ify them), batches are small because rows are wide, and
the extractors are callable classes sized by the shared ``_pool()`` helper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import media as M
from ..functions.hashing import phash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # 'audio' | 'video'
        ("bytes", pa.binary()),
    ]
)


def media_table(n_audio: int = 32, n_video: int = 16) -> pa.Table:
    """Deterministic synthetic media table (seed = row index)."""
    ids, kinds, blobs = [], [], []
    for i in range(n_audio):
        ids.append(f"aud{i:06d}")
        kinds.append("audio")
        blobs.append(M.synth_audio(i))
    for i in range(n_video):
        ids.append(f"vid{i:06d}")
        kinds.append("video")
        blobs.append(M.synth_video(i))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )


class MediaFeatures:
    """Actor stage: decode (stub) → per-kind features. One output row per
    input row; unknown containers are routed to an error column instead of
    raising (failure rows over exceptions, SURVEY §4 retries row)."""

    def __call__(self, b: pa.Table) -> pa.Table:
        n = b.num_rows
        kinds = b["kind"].to_pylist()
        blobs = b["bytes"].to_pylist()
        dur = np.zeros(n, dtype=np.float64)
        feat1 = np.zeros(n, dtype=np.float64)   # rms | mean frame pHash bits
        feat2 = np.zeros(n, dtype=np.float64)   # zcr | n sampled frames
        err = [""] * n
        for i in range(n):
            try:
                if kinds[i] == "audio":
                    samples, rate = M.decode_audio(blobs[i])
                    f = M.audio_features(samples, rate)
                    dur[i], feat1[i], feat2[i] = f["duration_s"], f["rms"], f["zcr"]
                elif kinds[i] == "video":
                    frames, fps = M.decode_video(blobs[i])
                    sampled = M.sample_frames(frames, every=4)
                    dur[i] = len(frames) / fps
                    feat1[i] = float(
                        np.mean([bin(phash64(fr) & ((1 << 64) - 1)).count("1") for fr in sampled])
                    )
                    feat2[i] = float(len(sampled))
                else:
                    err[i] = f"unknown kind {kinds[i]}"
            except NotImplementedError as e:  # real-format blob in a stub sandbox
                err[i] = str(e)
        return pa.table(
            {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "duration_s": pa.array(dur, pa.float64()),
                "feat1": pa.array(feat1, pa.float64()),
                "feat2": pa.array(feat2, pa.float64()),
                "error": pa.array(err, pa.string()),
            }
        )


def media_features_ds(n_audio: int = 32, n_video: int = 16):
    import ray.data as rd

    from .crawl_pipeline import _pool

    return rd.from_arrow(media_table(n_audio, n_video)).map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=8, concurrency=_pool()
    )


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Per-kind media feature aggregate (rows-only; stub-decode plumbing)."""
    df = media_features_ds().to_pandas()
    ok = df[df["error"] == ""]
    out = ok.groupby("kind", as_index=False).agg(
        n=("media_id", "count"),
        total_duration_s=("duration_s", "sum"),
        mean_feat1=("feat1", "mean"),
    )
    out["total_duration_s"] = out["total_duration_s"].round(6)
    out["mean_feat1"] = out["mean_feat1"].round(6)
    return out.sort_values("kind").reset_index(drop=True)


QUERIES = {"media_features": q_media_features}

"""Multimodal plumbing tests: stub codecs roundtrip, NotImplementedError
contract for real formats, actor-stage schema and error routing."""

from __future__ import annotations

import numpy as np
import pytest

from ieps_crawler_ray.functions import media as M


def test_audio_roundtrip():
    x = (np.sin(np.linspace(0, 50, 8000)) * 20000).astype(np.int16)
    samples, rate = M.decode_audio(M.encode_audio(x, 16_000))
    assert rate == 16_000
    np.testing.assert_array_equal(samples, x)


def test_video_roundtrip_and_sampling():
    f = np.arange(8 * 16 * 16, dtype=np.uint8).reshape(8, 16, 16)
    frames, fps = M.decode_video(M.encode_video(f, fps=4))
    np.testing.assert_array_equal(frames, f)
    assert fps == 4
    assert M.sample_frames(frames, every=4).shape[0] == 2


def test_real_formats_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"RIFF....WAVE" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        M.decode_video(b"\x00\x00\x00 ftypmp42" + b"\x00" * 64)


def test_resize_block_mean():
    img = np.full((64, 64), 7, dtype=np.uint8)
    out = M.resize_block_mean(img, 32, 32)
    assert out.shape == (32, 32) and (out == 7).all()


def test_media_features_stage(ray_session):
    from ieps_crawler_ray.pipelines.media import media_features_ds, q_media_features

    df = media_features_ds(n_audio=8, n_video=4).to_pandas()
    assert set(df.columns) == {"media_id", "kind", "duration_s", "feat1", "feat2", "error"}
    assert (df["error"] == "").all()
    assert (df[df["kind"] == "audio"]["duration_s"] > 0).all()
    agg = q_media_features("unused")
    assert list(agg["kind"]) == ["audio", "video"]


def test_media_stage_routes_bad_blob_to_error(ray_session):
    import pyarrow as pa

    from ieps_crawler_ray.pipelines.media import MediaFeatures

    t = pa.table(
        {
            "media_id": ["x"],
            "kind": ["audio"],
            "bytes": [b"not-a-container"],
        }
    )
    out = MediaFeatures()(t)
    assert out["error"][0].as_py() != ""

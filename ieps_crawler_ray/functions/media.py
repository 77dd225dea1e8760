"""Audio/video treatment for the multimodal pipeline surface.

No audio/video codec libraries exist in this sandbox, so — as with the jpeg
stub in codecs.py — the *containers* are deterministic fakes while every
Ray-side concern (opaque ``binary`` column + typed metadata, small batches,
actor-pool stage signatures, output schema) is real and tested:

* ``FAKA`` audio container: int16 mono PCM, zlib-compressed, sample-rate in
  the header. ``decode_audio`` on anything else raises ``NotImplementedError``
  — swap in a real decoder (ffmpeg/soundfile) behind the same function.
* ``FAKV`` video container: N uint8 grayscale frames (h, w), zlib-compressed,
  dims + fps in the header. Same NotImplementedError contract.

Feature extractors (RMS / zero-crossing-rate for audio, frame sampling +
per-frame pHash for video) are pure numpy and run inside
``map_batches(Cls, batch_size=small)`` actor stages (pipelines/media.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_AUD_SIG = b"FAKA"
_VID_SIG = b"FAKV"


# ----------------------------------------------------------------- encode ----


def encode_audio(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono PCM → stub container."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    return _AUD_SIG + struct.pack(">II", sample_rate, len(s)) + zlib.compress(s.tobytes(), 6)


def encode_video(frames: np.ndarray, fps: int = 8) -> bytes:
    """(n, h, w) uint8 grayscale frames → stub container."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return _VID_SIG + struct.pack(">IIII", n, h, w, fps) + zlib.compress(f.tobytes(), 6)


# ----------------------------------------------------------------- decode ----


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples, sample_rate). STUB: only the FAKA container is
    decodable in this sandbox; real formats raise NotImplementedError."""
    if data[:4] != _AUD_SIG:
        raise NotImplementedError(
            "no real audio codec in this environment — only the FAKA stub container"
        )
    rate, n = struct.unpack(">II", data[4:12])
    samples = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)[:n]
    return samples, rate


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """→ ((n, h, w) uint8 frames, fps). STUB — see decode_audio."""
    if data[:4] != _VID_SIG:
        raise NotImplementedError(
            "no real video codec in this environment — only the FAKV stub container"
        )
    n, h, w, fps = struct.unpack(">IIII", data[4:20])
    frames = np.frombuffer(zlib.decompress(data[20:]), dtype=np.uint8)[: n * h * w]
    return frames.reshape(n, h, w), fps


# --------------------------------------------------------------- features ----


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """RMS level, zero-crossing rate, duration — the batched-model-inference
    placeholder for a real audio embedding."""
    x = samples.astype(np.float64) / 32768.0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "duration_s": len(x) / rate,
        "rms": float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
        "zcr": zc / max(len(x) - 1, 1),
    }


def sample_frames(frames: np.ndarray, every: int = 4) -> np.ndarray:
    """Frame sampling: every k-th frame (the video analogue of batch decode)."""
    return frames[::every]


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean resize for uint8 images whose dims divide the target;
    stride-sample fallback otherwise (same policy as hashing.phash64)."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        v = img.reshape(out_h, h // out_h, out_w, w // out_w, *img.shape[2:])
        return v.mean(axis=(1, 3)).astype(np.uint8)
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[np.ix_(yi, xi)]


# -------------------------------------------------- deterministic synthesis ---


def synth_audio(seed_idx: int, rate: int = 16_000, secs: float = 0.5) -> bytes:
    """Seeded sinusoid-mix clip (counter-based like the image corpus)."""
    from .hashing import U64, mix2

    p = mix2(np.full(3, seed_idx, dtype=np.uint64), np.arange(3, dtype=np.uint64))
    n = int(rate * secs)
    t = np.arange(n) / rate
    f0 = 100.0 + float(p[0] % U64(400))
    f1 = 500.0 + float(p[1] % U64(2000))
    amp = 0.2 + float(p[2] % U64(60)) / 100.0
    x = amp * np.sin(2 * np.pi * f0 * t) + (1 - amp) * 0.5 * np.sin(2 * np.pi * f1 * t)
    return encode_audio((x * 32767 * 0.8).astype(np.int16), rate)


def synth_video(seed_idx: int, n_frames: int = 16, h: int = 64, w: int = 64) -> bytes:
    """Seeded moving-gradient clip."""
    from .hashing import U64, mix2

    p = mix2(np.full(2, seed_idx, dtype=np.uint64), np.arange(2, dtype=np.uint64))
    gx = float(p[0] % U64(5)) + 1.0
    vx = float(p[1] % U64(7)) - 3.0
    xs = np.arange(w, dtype=np.float64)[None, None, :]
    ts = np.arange(n_frames, dtype=np.float64)[:, None, None]
    frames = np.mod(gx * xs + vx * ts * 4.0, 256.0)
    frames = np.broadcast_to(frames, (n_frames, h, w))
    return encode_video(frames.astype(np.uint8))

"""Image codecs for the sandbox — no image libraries (PIL/opencv) are installed,
so the graft's image plumbing uses:

  * ``png``  — a real, spec-conformant PNG writer/reader (8-bit RGB, filter 0,
    zlib), pure python+numpy. Lossless: decode(encode(x)) == x byte-exact.
  * ``jpeg`` — **STUB lossy codec**: the container is NOT real JPEG (no JPEG
    encoder exists in this environment). It is a deterministic stand-in that
    reproduces JPEG's *property relevant to the pipeline*: lossy round-trip with
    PSNR ≈ 46 dB (6-bit uniform quantization + zlib), exercising the
    "decoded pixels allclose / PSNR ≥ 40 dB for lossy formats" verification path
    mandated by BASELINE.json. Swap `_encode_qlossy/_decode_qlossy` for a real
    JPEG codec when one is available; every caller goes through
    ``encode_image`` / ``decode_image`` so nothing else changes.

Mirrors the reference's image handling surface (crawler.py:437-541 stores raw
bytes + content_type; decoding happens downstream).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = a.reshape(h, w * 3)
    # deflate "stored" mode (level 0): the synthetic sinusoid images are
    # incompressible (level-6 ratio ≈ 1.000 measured), so higher levels buy
    # ~0.03 % size for ~20× the CPU in the encode/verify hot path. Still a
    # spec-conformant PNG stream.
    idat = zlib.compress(raw.tobytes(), 0)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports what encode_png writes
    (8-bit RGB, non-interlaced, filter 0 — raises on anything else)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


_QL_SIG = b"QLSY"  # stub lossy container magic
_Q_BITS = 6  # 6-bit quantization → PSNR ≈ 46 dB (step 4, MSE ≈ 4²/12)


def _encode_qlossy(pixels: np.ndarray) -> bytes:
    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    q = a >> (8 - _Q_BITS)
    # stored-mode deflate, same rationale as encode_png (the ~25 % level-6
    # ratio on quantized pixels is not worth ~50× the encode CPU per image)
    payload = zlib.compress(q.tobytes(), 0)
    return _QL_SIG + struct.pack(">IIB", w, h, _Q_BITS) + payload


def _decode_qlossy(data: bytes) -> np.ndarray:
    assert data[:4] == _QL_SIG, "not a QLSY stream"
    w, h, bits = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bucket centers
    shift = 8 - bits
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":  # stub lossy codec — see module docstring
        return _encode_qlossy(pixels)
    raise NotImplementedError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if fmt == "png" or (fmt is None and data[:8] == _PNG_SIG):
        return decode_png(data)
    if fmt == "jpeg" or (fmt is None and data[:4] == _QL_SIG):
        return _decode_qlossy(data)
    raise NotImplementedError(f"unknown image format (fmt={fmt!r})")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf if equal).

    MSE is computed in exact integer arithmetic (int16 diff → int32 square →
    int64 sum): bit-identical to the float64 formula for uint8 inputs at a
    quarter of the memory traffic — this runs per image in the verify hot
    path, where float64 temporaries made the stage bandwidth-bound."""
    x = np.asarray(a)
    y = np.asarray(b)
    d = x.astype(np.int16) - y.astype(np.int16)
    sq = d.astype(np.int32)
    np.multiply(sq, sq, out=sq)
    total = int(sq.sum(dtype=np.int64))
    if total == 0:
        return float("inf")
    mse = total / d.size
    return 10.0 * np.log10(255.0**2 / mse)

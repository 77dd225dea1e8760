"""Vectorized hashing kernels: 64-bit url/content hashes, MinHash, SimHash, pHash.

Reference semantics mirrored (see SURVEY.md §2.7/§2.8):
  - exact content hash: md5/sha256 hex digests (Estrella.py:226, crawler.py:362-364)
  - MinHash: 200 permutations of ``(a*x + b) mod 2**32`` over whitespace tokens,
    estimated Jaccard = mean positional equality, threshold 0.8
    (Estrella.py:93-114, 580-603) — re-implemented as a seeded, vectorized numpy
    kernel (the reference seeds ``random`` implicitly; we use a fixed seed so the
    engine and the oracle agree).
  - pHash: DCT-based 64-bit perceptual hash (graft spec, BASELINE.json input_hint).

All kernels take/return numpy arrays so they run zero-copy inside
``map_batches(batch_format="pyarrow")`` bodies.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

import numpy as np
import polars as pl

U64 = np.uint64
_M32 = U64(0xFFFFFFFF)
HASH_SEED = 1042


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based deterministic 64-bit mixer (public splitmix64 constants)."""
    x = np.atleast_1d(np.asarray(x, dtype=np.uint64))
    with np.errstate(over="ignore"):
        x = x + U64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
        return x ^ (x >> U64(31))


def mix2(a: np.ndarray, b) -> np.ndarray:
    """Combine two 64-bit streams deterministically."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    return splitmix64(a ^ splitmix64(b))


def hash64(values: Sequence[str] | np.ndarray | "pl.Series", seed: int = HASH_SEED) -> np.ndarray:
    """Vectorized 64-bit hash of a string column → uint64 numpy array.

    Uses polars' Rust-side string hasher (vectorized, no Python loop). Stable
    within this environment; both the Ray engine and the sequential oracle call
    this same function, so parity never depends on cross-library stability.
    """
    s = pl.Series(values=values, dtype=pl.Utf8)
    return s.hash(seed=seed).to_numpy()


def md5_hex(values: Iterable[str]) -> list[str]:
    """Exact-content hash, md5 hex — crawler.py:362-364 semantics."""
    return [hashlib.md5(v.encode("utf-8")).hexdigest() for v in values]


def sha256_hex(values: Iterable[str]) -> list[str]:
    """Exact-content hash, sha256 hex — Estrella.py:226 semantics."""
    return [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values]


def _flatten_token_hashes(token_lists: Sequence[Sequence[str]]):
    """Flatten ragged token lists → (flat uint64 hashes, doc offsets, lengths)."""
    lengths = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=len(token_lists))
    flat: list[str] = [tok for toks in token_lists for tok in toks]
    hashes = hash64(flat) if flat else np.empty(0, dtype=np.uint64)
    offsets = np.zeros(len(token_lists), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return hashes, offsets, lengths


class MinHasher:
    """Seeded 200-perm MinHash over token sets (mirrors Estrella.py:93-114).

    signature[i] = min over tokens of (a_i * h32(token) + b_i) mod 2**32,
    Jaccard estimate = mean positional equality (Estrella.py:580-582).
    Vectorized: a whole batch of documents is signed with one reduceat pass.
    """

    def __init__(self, num_perms: int = 200, seed: int = 7_042):
        rng = np.random.default_rng(seed)
        self.num_perms = num_perms
        self.a = rng.integers(1, 2**32 - 1, num_perms, dtype=np.uint64)
        self.b = rng.integers(0, 2**32 - 1, num_perms, dtype=np.uint64)
        self.empty = np.full(num_perms, _M32, dtype=np.uint64)

    def signatures(self, token_lists: Sequence[Sequence[str]]) -> np.ndarray:
        """(n_docs, num_perms) uint64 signature matrix (values < 2**32).

        The permutation matrix is computed in uint32: C unsigned overflow
        wraps mod 2**32, which IS the `& _M32` of the formula — identical
        values at half the memory traffic of the uint64 version (this matrix
        is (total_tokens × 200), the crawl's dedup_sig hot spot)."""
        n = len(token_lists)
        out = np.empty((n, self.num_perms), dtype=np.uint64)
        if n == 0:
            return out
        hashes, offsets, lengths = _flatten_token_hashes(token_lists)
        if len(hashes) == 0:
            out[:] = self.empty
            return out
        x32 = (hashes & _M32).astype(np.uint32)               # (T,)
        a32 = self.a.astype(np.uint32)
        b32 = self.b.astype(np.uint32)
        # permute only the UNIQUE token hashes (vocabulary ≪ token stream in
        # real text), then gather rows back to token order — the multiply
        # runs on (U, P) and the (T, P) expansion is a pure memcpy
        u, inv = np.unique(x32, return_inverse=True)
        perms = (u[:, None] * a32[None, :] + b32[None, :])[inv]  # (T, P) mod 2**32
        nonempty = lengths > 0
        # reduceat needs strictly valid segment starts; drop empty docs first
        if nonempty.all():
            out[:] = np.minimum.reduceat(perms, offsets, axis=0)
        else:
            out[:] = self.empty
            ne_offsets = offsets[nonempty]
            out[nonempty] = np.minimum.reduceat(perms, ne_offsets, axis=0)
        return out

    @staticmethod
    def jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    def band_keys(self, sigs: np.ndarray, bands: int = 25) -> np.ndarray:
        """LSH band keys: (n_docs, bands) uint64; equal key → candidate pair.

        bands must divide num_perms; rows-per-band = num_perms // bands.
        """
        n, p = sigs.shape
        assert p % bands == 0, "bands must divide num_perms"
        rows = p // bands
        folded = sigs.reshape(n, bands, rows)
        key = np.full((n, bands), U64(bands), dtype=np.uint64)
        for r in range(rows):
            key = mix2(key, folded[:, :, r])
        # mix the band index in so band b of doc X can't collide with band c of doc Y
        key = mix2(key, np.arange(bands, dtype=np.uint64)[None, :])
        return key


def simhash64(token_lists: Sequence[Sequence[str]]) -> np.ndarray:
    """64-bit SimHash per document (sign of per-bit weighted sums)."""
    n = len(token_lists)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    hashes, offsets, lengths = _flatten_token_hashes(token_lists)
    if len(hashes) == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hashes[:, None] >> shifts[None, :]) & U64(1)).astype(np.int32)  # (T, 64)
    signed = 2 * bits - 1
    nonempty = lengths > 0
    sums = np.zeros((n, 64), dtype=np.int64)
    if nonempty.any():
        sums[nonempty] = np.add.reduceat(signed, offsets[nonempty], axis=0)
    packed = (sums > 0).astype(np.uint64)
    out = (packed << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[~nonempty] = U64(0)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element popcount of XOR of two uint64 arrays."""
    x = np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64_matrix(p: np.ndarray) -> np.ndarray:
    """(m, m) pairwise Hamming distances of a uint64 vector, via a byte
    popcount LUT (8 lookups/pair — an order of magnitude less memory than
    unpackbits for the long pHash-band runs in the dedup verify)."""
    return hamming64_cross(p, p)


def hamming64_cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(len(a), len(b)) Hamming distances between two uint64 vectors."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    x = a[:, None] ^ b[None, :]
    return _POP8[x.view(np.uint8)].reshape(len(a), len(b), 8).sum(axis=2, dtype=np.uint16)


def capped_band_pairs(
    ids: np.ndarray, hashes: np.ndarray, threshold: int, cap: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Verified near-duplicate pair emission for ONE LSH band bucket, with
    the ``band_key_cap`` flood guard (the same guard the crawl dedup's
    `_verify_bucket` and `IEPS_SIMHASH_BAND_CAP` apply — reference
    analogue: the MinHash dup arbitration of oldstufffrompa1/
    crawler.py:366-410 never compares beyond its cache).

    cap == 0: exact mode — every in-bucket pair is compared (O(n²); safe
    only when bucket sizes are bounded upstream). cap > 0: each row is
    verified against at most the ``cap`` OLDEST (smallest-id) rows of the
    bucket, bounding compares at O(cap·n) so a degenerate hash (e.g.
    solid-color images all pHashing alike) cannot go quadratic. Because
    the keep rule downstream is min-id-wins, every flooded row still
    links to its cluster's winner row, so connected components — and the
    dedup manifests derived from them — are preserved for identical-hash
    floods; only redundant far-tail edges are skipped.

    Returns (id_a, id_b, hamming) with id_a < id_b, unsorted.
    """
    order = np.argsort(ids, kind="stable")
    idv = np.asarray(ids)[order]
    h = np.asarray(hashes).view(np.uint64)[order]
    n = len(idv)
    empty = (
        np.empty(0, idv.dtype),
        np.empty(0, idv.dtype),
        np.empty(0, np.int64),
    )
    if n < 2:
        return empty
    if cap and n > cap + 1:
        k = int(cap)
        counts = n - 1 - np.arange(k, dtype=np.int64)
        ia = np.repeat(np.arange(k, dtype=np.int64), counts)
        seg_starts = np.cumsum(counts) - counts
        ib = np.arange(counts.sum(), dtype=np.int64) - np.repeat(seg_starts, counts) + ia + 1
    else:
        ia, ib = np.triu_indices(n, k=1)
    ham = hamming64(h[ia], h[ib]).astype(np.int64)
    keep = ham <= threshold
    return idv[ia[keep]], idv[ib[keep]], ham[keep]


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0, :] = 1.0 / np.sqrt(n)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """DCT perceptual hash of an (h, w) or (h, w, 3) uint8 image → signed int64.

    Block-mean resize to 32×32 → orthonormal 2-D DCT → top-left 8×8 minus the
    DC term → threshold at the median → 64 bits. Deterministic, pure numpy
    (no image libraries in this sandbox). Signed int64 to match the mandated
    ``phash:int64`` column type.
    """
    px = np.asarray(pixels)
    h, w = px.shape[0], px.shape[1]
    # block-mean (assumes h, w multiples of 32, true for the synthetic corpus;
    # fall back to stride sampling otherwise). Channel + block reduction runs
    # as ONE integer sum over the uint8 data (exact, no float64 temporaries of
    # the full image — this is the verify path's hottest kernel).
    if h % 32 == 0 and w % 32 == 0:
        nc = px.shape[2] if px.ndim == 3 else 1
        s = px.reshape(32, h // 32, 32, w // 32, -1).sum(axis=(1, 3, 4), dtype=np.int64)
        a = s / (nc * (h // 32) * (w // 32))
    else:
        a = np.asarray(px, dtype=np.float64)
        if a.ndim == 3:
            a = a.mean(axis=2)
        yi = (np.arange(32) * h) // 32
        xi = (np.arange(32) * w) // 32
        a = a[np.ix_(yi, xi)]
    d = _dct_matrix(32)
    coefs = d @ a @ d.T
    block = coefs[:8, :8].flatten()[1:]
    bits = block > np.median(block)
    val = U64(0)
    for bit in bits:
        val = (val << U64(1)) | U64(bool(bit))
    return int(np.int64(val.astype(np.int64)))


def phash_band_keys(phashes: np.ndarray, bands: int = 4) -> np.ndarray:
    """Split 64-bit pHashes into ``bands`` chunks → (n, bands) uint64 keys.

    Two images within Hamming distance < bands share at least one band key
    (pigeonhole) → groupby-able candidate generation for near-dup.
    """
    ph = np.asarray(phashes).astype(np.uint64)
    width = U64(64 // bands)
    mask = (U64(1) << width) - U64(1)
    keys = np.empty((len(ph), bands), dtype=np.uint64)
    for b in range(bands):
        chunk = (ph >> (U64(b) * width)) & mask
        keys[:, b] = mix2(chunk, np.full(len(ph), U64(b + 101)))
    return keys


# Karp-Rabin rolling-hash parameters for content-defined chunking. ``_CDC_P``
# is odd → invertible mod 2**64, so the window hash factors through prefix
# sums (see cdc_boundaries) and the whole scan vectorizes.
_CDC_P = U64(0x100000001B3)  # FNV prime (public constant), odd
_CDC_Q = U64(pow(0x100000001B3, -1, 1 << 64))  # modular inverse of _CDC_P


def cdc_chunks(data: np.ndarray, window: int = 16, divisor: int = 64):
    """Content-defined chunking (Rabin-style CDC, the public baseline behind
    LBFS/FastCDC) over a byte array, fully vectorized. Returns
    ``(cuts, hashes)``: the sorted END indices (exclusive) of each chunk —
    always including ``len(data)`` as the final boundary — and one 64-bit
    content hash per chunk.

    A boundary falls AFTER position i (i ≥ window-1) whenever the Karp-Rabin
    hash of the trailing ``window`` bytes ≡ 0 (mod ``divisor``). The window
    hash h(i) = Σ_k b[i-k]·p^k is computed for every i at once via the
    invertible-multiplier trick: with S[i] = Σ_{j≤i} b[j]·q^j (q = p⁻¹ mod
    2⁶⁴, natural uint64 wraparound as the modulus), h(i) = p^i·(S[i]−S[i−w]).
    splitmix64 finalizes so the low bits used by the mod-divisor test are
    well mixed. The per-chunk hash reuses the same prefix sums: the hash of
    bytes [a, b) is p^(b−1)·(S[b−1]−S[a−1]) = Σ_j b[j]·p^(b−1−j) — a pure
    function of the chunk CONTENT (offset-independent), finalized with
    splitmix64 and xored with the chunk length so short chunks don't alias.
    """
    b = np.asarray(data, dtype=np.uint64)
    n = len(b)
    if n == 0:
        return np.array([0], dtype=np.int64), np.zeros(1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        qpow = np.empty(n, dtype=np.uint64)
        qpow[0] = U64(1)
        if n > 1:
            np.cumprod(np.full(n - 1, _CDC_Q, dtype=np.uint64), out=qpow[1:])
        ppow = np.empty(n, dtype=np.uint64)
        ppow[0] = U64(1)
        if n > 1:
            np.cumprod(np.full(n - 1, _CDC_P, dtype=np.uint64), out=ppow[1:])
        s = np.cumsum(b * qpow, dtype=np.uint64)
        if n >= window:
            h = ppow[window - 1 :] * (
                s[window - 1 :] - np.concatenate(([U64(0)], s[: n - window]))
            )
            cut = np.nonzero(splitmix64(h) % U64(divisor) == U64(0))[0] + np.int64(window)
        else:
            cut = np.empty(0, dtype=np.int64)
        if len(cut) == 0 or cut[-1] != n:
            cut = np.concatenate([cut, [n]]).astype(np.int64)
        s0 = np.concatenate(([U64(0)], s))  # s0[i] = S[i-1]
        starts = np.concatenate(([0], cut[:-1]))
        chash = ppow[cut - 1] * (s0[cut] - s0[starts])
    lens = (cut - starts).astype(np.uint64)
    return cut, splitmix64(chash) ^ splitmix64(lens)


def cdc_boundaries(data: np.ndarray, window: int = 16, divisor: int = 64) -> np.ndarray:
    """Chunk END indices only — see cdc_chunks."""
    return cdc_chunks(data, window, divisor)[0]

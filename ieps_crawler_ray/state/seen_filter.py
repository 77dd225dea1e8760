"""Per-partition URL-seen bloom filter (north_rule: "stateful actor pools own
per-host bloom/cuckoo URL-seen filters").

Role in the engine (SURVEY §7.5.2): the bloom filter is a **fast negative
pre-filter** only — a "definitely new" URL skips the exact seen-table lookup;
a "maybe seen" URL goes through the authoritative per-bucket exact anti-join.
Correctness therefore never depends on the false-positive rate; the filter
only reduces how much of the seen table a generation has to read.

Pure numpy bit array + splitmix64 double hashing (Kirsch–Mitzenmacher), so it
is cheap to (de)serialize into a generation checkpoint and to ship to the
anti-join tasks via ``ray.put``.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import U64, splitmix64


class BloomFilter:
    """Fixed-size bloom filter over uint64 keys.

    ``capacity`` and ``fp_rate`` size the bit array once; at 10^10-URL scale
    each url_hash-bucket partition owns its own filter so no single filter
    needs to span the whole seen set (SURVEY §7.5.5).
    """

    __slots__ = ("n_bits", "n_hashes", "bits")

    def __init__(self, capacity: int, fp_rate: float = 0.01, _bits: np.ndarray | None = None):
        n_bits = int(max(64, -capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = (n_bits + 63) // 64 * 64
        self.n_hashes = max(1, int(round(self.n_bits / max(capacity, 1) * np.log(2))))
        self.bits = (
            _bits if _bits is not None else np.zeros(self.n_bits // 64, dtype=np.uint64)
        )

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n_keys, n_hashes) bit positions via double hashing."""
        k = np.asarray(keys, dtype=np.uint64)
        h1 = splitmix64(k)
        h2 = splitmix64(k ^ U64(0xA5A5A5A5A5A5A5A5)) | U64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) % U64(self.n_bits)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> U64(6)).astype(np.int64), U64(1) << (pos & U64(63)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """bool array: False = definitely not seen; True = maybe seen."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        word = self.bits[(pos >> U64(6)).astype(np.int64)]
        hit = (word >> (pos & U64(63))) & U64(1)
        return hit.all(axis=1)

    # ------------------------------------------------------------ checkpoint
    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype=np.uint64)
        return head.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        head = np.frombuffer(data[:16], dtype=np.uint64)
        bits = np.frombuffer(data[16:], dtype=np.uint64).copy()
        obj = cls.__new__(cls)
        obj.n_bits, obj.n_hashes = int(head[0]), int(head[1])
        obj.bits = bits
        return obj

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        self.bits |= other.bits
        return self

class CuckooFilter:
    """Cuckoo filter over uint64 keys — the north_rule's alternate seen-filter
    backend ("bloom/cuckoo URL-seen filters"), drop-in for :class:`BloomFilter`
    (same add_many / contains_many / to_bytes contract, selected via
    ``IEPS_SEEN_FILTER=cuckoo``).

    4-slot buckets of 16-bit fingerprints (Fan et al., CoNEXT 2014): a key
    hashes to bucket i1 and its partner i2 = i1 XOR hash(fp), so membership
    is two vectorized row probes. Like the bloom, inserted keys can NEVER
    read "definitely not seen" (the pre-filter contract the admission path
    relies on) — ``add_many`` raises if the table can't place a key, which
    sizing at ≤95 % load makes vanishingly rare. Beyond the bloom it
    supports ``delete_many`` (constant-time un-see of keys KNOWN to be
    inserted — deleting a never-inserted key could evict a twin fingerprint
    and break the no-false-negative contract, so the engine's rollback
    keeps using the generation-stamped file map instead, which rewinds both
    backends in O(1) without deletions). Eviction victims are chosen by a
    deterministic splitmix64 walk: state files are byte-reproducible."""

    __slots__ = ("n_buckets", "table")
    _MAX_KICKS = 500

    def __init__(self, capacity: int, _table: np.ndarray | None = None):
        nb = 64
        while nb * 4 * 0.95 < capacity:
            nb <<= 1
        self.n_buckets = nb
        self.table = _table if _table is not None else np.zeros((nb, 4), dtype=np.uint16)

    def _slots(self, keys: np.ndarray):
        k = np.asarray(keys, dtype=np.uint64)
        h = splitmix64(k)
        fp = ((h >> U64(48)) & U64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        mask = U64(self.n_buckets - 1)
        i1 = (h & mask).astype(np.int64)
        ph = splitmix64(fp.astype(np.uint64) ^ U64(0x5BD1E995C0FFEE11))
        i2 = i1 ^ (ph & mask).astype(np.int64)
        return fp, i1, i2

    def _partner(self, i: int, fp: int) -> int:
        ph = splitmix64(np.array([fp], dtype=np.uint64) ^ U64(0x5BD1E995C0FFEE11))
        return i ^ int(ph[0] & U64(self.n_buckets - 1))

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        fp, i1, i2 = self._slots(keys)
        t = self.table
        for j in range(len(fp)):
            f, a, b = int(fp[j]), int(i1[j]), int(i2[j])
            placed = False
            for bucket in (a, b):
                row = t[bucket]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = f
                    placed = True
                    break
            if placed:
                continue
            cur = a
            for kick in range(self._MAX_KICKS):
                # deterministic victim slot
                slot = int(splitmix64(np.array([cur * 4 + kick], dtype=np.uint64))[0] & U64(3))
                f, t[cur, slot] = int(t[cur, slot]), f
                cur = self._partner(cur, f)
                row = t[cur]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = f
                    placed = True
                    break
            if not placed:
                raise RuntimeError(
                    f"cuckoo filter over capacity (n_buckets={self.n_buckets})"
                )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """bool array: False = definitely not seen; True = maybe seen."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._slots(keys)
        f = fp[:, None]
        return ((self.table[i1] == f) | (self.table[i2] == f)).any(axis=1)

    def delete_many(self, keys: np.ndarray) -> None:
        """Remove ONE stored occurrence per key (keys must have been added)."""
        if len(keys) == 0:
            return
        fp, i1, i2 = self._slots(keys)
        for j in range(len(fp)):
            f = int(fp[j])
            for bucket in (int(i1[j]), int(i2[j])):
                hit = np.flatnonzero(self.table[bucket] == f)
                if len(hit):
                    self.table[bucket, hit[0]] = 0
                    break
            else:
                raise KeyError(f"key not present (fp={f})")

    # ------------------------------------------------------------ checkpoint
    def to_bytes(self) -> bytes:
        # head[0] = 0 is the cuckoo magic: a bloom's n_bits is always ≥ 64,
        # so the two formats are distinguishable without a version bump
        head = np.array([0, self.n_buckets], dtype=np.uint64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:16], dtype=np.uint64)
        assert int(head[0]) == 0, "not a cuckoo filter blob"
        nb = int(head[1])
        table = np.frombuffer(data[16:], dtype=np.uint16).reshape(nb, 4).copy()
        return cls.__new__(cls).__init_from(nb, table)

    def __init_from(self, nb: int, table: np.ndarray) -> "CuckooFilter":
        self.n_buckets = nb
        self.table = table
        return self


def make_seen_filter(capacity: int):
    """Factory for the seen pre-filter backend (IEPS_SEEN_FILTER=cuckoo|bloom)."""
    import os

    if os.environ.get("IEPS_SEEN_FILTER", "bloom") == "cuckoo":
        return CuckooFilter(capacity)
    return BloomFilter(capacity)


def seen_filter_from_bytes(data: bytes):
    """Load either backend from a checkpoint blob (self-describing header)."""
    head = np.frombuffer(data[:8], dtype=np.uint64)
    return CuckooFilter.from_bytes(data) if int(head[0]) == 0 else BloomFilter.from_bytes(data)

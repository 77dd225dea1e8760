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

"""numpy bloom filter over int64 keys (vectorized add/probe).

PySpark exposes no DataFrame-level bloom state (``df.stat.bloomFilter``
is JVM-only and not reachable from PySpark 4.1.2 — SURVEY.md §2.B), so
this is the engine's own: splitmix64 double-hashing, bit array in a
numpy uint8 buffer, serialized with a small struct header.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"BLM1"
_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> _U64(31))


class BloomFilter:
    """Bloom filter for int64 keys. ``m`` bits, ``k`` probes."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        capacity = max(1, int(capacity))
        m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = max(64, (m + 7) // 8 * 8)  # byte-aligned
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.n = 0
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    # -- hashing ---------------------------------------------------------
    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via double hashing."""
        u = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _U64(0xA5A5A5A5A5A5A5A5)) | _U64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % _U64(self.m)).astype(np.int64)

    # -- ops --------------------------------------------------------------
    def add(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n += int(keys.size)

    def contains(self, keys) -> np.ndarray:
        """Vectorized probe → bool array (no false negatives)."""
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<qqq", self.m, self.k, self.n) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a bloom blob")
        m, k, n = struct.unpack_from("<qqq", blob, 4)
        f = cls.__new__(cls)
        f.m, f.k, f.n = m, k, n
        f.bits = np.frombuffer(blob[4 + 24:], dtype=np.uint8).copy()
        return f

    def union(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("incompatible bloom parameters")
        out = BloomFilter.__new__(BloomFilter)
        out.m, out.k, out.n = self.m, self.k, self.n + other.n
        out.bits = self.bits | other.bits
        return out

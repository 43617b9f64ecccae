"""Cuckoo filter over int64 keys (numpy bucket table, delete support).

Standard partial-key cuckoo hashing (Fan et al., CoNLT'14 — public
algorithm): 16-bit fingerprints, 4 slots per bucket, alternate bucket
``i2 = i1 XOR hash(fp)``. Probe is fully vectorized; insert walks a
small python loop per key (eviction chains are rare below ~95% load,
and the engine sizes for ≤50%). Serialized as a self-describing blob.
"""

from __future__ import annotations

import struct

import numpy as np

from .bloom import _splitmix64

_MAGIC = b"CKF1"
_U64 = np.uint64
SLOTS = 4
MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 42):
        capacity = max(1, int(capacity))
        nb = 1
        while nb * SLOTS < capacity * 2:  # target ≤50% load
            nb <<= 1
        self.n_buckets = nb
        self.seed = seed
        self.n = 0
        self.table = np.zeros((nb, SLOTS), dtype=np.uint16)  # 0 = empty

    # -- hashing ---------------------------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_splitmix64(keys.view(np.uint64) ^ _U64(self.seed)) & _U64(0xFFFF)).astype(
            np.uint16
        )
        fp[fp == 0] = 1  # 0 is the empty marker
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (
            _splitmix64(keys.view(np.uint64) ^ _U64(0x5BD1E995))
            % _U64(self.n_buckets)
        ).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = _splitmix64(fp.astype(np.uint64)) % _U64(self.n_buckets)
        return (i.astype(np.uint64) ^ h).astype(np.int64) % self.n_buckets

    # -- ops --------------------------------------------------------------
    def add(self, keys) -> int:
        """Insert keys; returns number successfully inserted (a full
        filter rejects — the engine resizes/reshards on rejection)."""
        keys = np.asarray(keys, dtype=np.int64)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._alt(i1s, fps)
        rng = np.random.default_rng(self.seed)
        ok = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            if self._try_put(i1, fp) or self._try_put(i2, fp):
                ok += 1
                continue
            # eviction chain
            i, cur = (i1 if rng.integers(2) else i2), fp
            placed = False
            for _ in range(MAX_KICKS):
                slot = int(rng.integers(SLOTS))
                cur, self.table[i, slot] = self.table[i, slot], cur
                i = int(self._alt(np.array([i]), np.array([cur], dtype=np.uint16))[0])
                if self._try_put(i, cur):
                    placed = True
                    break
            if placed:
                ok += 1
        self.n += ok
        return ok

    def _try_put(self, i: int, fp: np.uint16) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            self.table[i, empty[0]] = fp
            return True
        return False

    def contains(self, keys) -> np.ndarray:
        """Vectorized membership probe (no false negatives)."""
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._alt(i1s, fps)
        hit1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, keys) -> int:
        """Remove one fingerprint occurrence per present key."""
        keys = np.asarray(keys, dtype=np.int64)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._alt(i1s, fps)
        removed = 0
        for fp, i1, i2 in zip(fps, i1s, i2s):
            done = False
            for i in (i1, i2):
                slots = np.nonzero(self.table[i] == fp)[0]
                if slots.size:
                    self.table[i, slots[0]] = 0
                    removed += 1
                    done = True
                    break
            if done:
                continue
        self.n -= removed
        return removed

    # -- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return (
            _MAGIC
            + struct.pack("<qqq", self.n_buckets, self.seed, self.n)
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a cuckoo blob")
        nb, seed, n = struct.unpack_from("<qqq", blob, 4)
        f = cls.__new__(cls)
        f.n_buckets, f.seed, f.n = nb, seed, n
        f.table = (
            np.frombuffer(blob[4 + 24:], dtype=np.uint16).reshape(nb, SLOTS).copy()
        )
        return f

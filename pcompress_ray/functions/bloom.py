"""Vectorized Bloom filter over 64-bit keys.

Scale rationale: a broadcast semi-join key set of N int64 ids costs 8N
bytes per worker; at 10^9+ participating ids that's GBs per node. A Bloom
filter at ~10 bits/key is 80× smaller with ~1% false positives — safe
wherever the consumer re-verifies (the candidate-verify join does), the
same role as the reference's bounded in-RAM index with eviction
(rabin/global/index.c:539-547) but with NO false negatives instead of
silently forgetting old keys.

All operations are whole-array numpy: k probe positions are derived by
double hashing h1 + i*h2 (Kirsch-Mitzenmacher), bits live in one uint64
array.
"""

from __future__ import annotations

import numpy as np

from pcompress_ray.hashing import splitmix64

U64 = np.uint64
_SEED2 = U64(0xD6E8FEB86659FD93)


class BloomFilter:
    __slots__ = ("bits", "n_bits", "k")

    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits
        self.n_bits = n_bits
        self.k = k

    @classmethod
    def build(cls, keys: np.ndarray, bits_per_key: int = 10) -> "BloomFilter":
        keys = np.asarray(keys).astype(U64, copy=False)
        n = max(int(keys.size), 1)
        n_bits = 1 << max(int(np.ceil(np.log2(n * bits_per_key + 1))), 6)
        k = max(1, int(round(bits_per_key * 0.6931)))  # ln2 * bits/key
        bits = np.zeros(n_bits >> 6, dtype=U64)
        if keys.size:
            h1 = splitmix64(keys)
            h2 = splitmix64(keys ^ _SEED2) | U64(1)
            mask = U64(n_bits - 1)
            for i in range(k):
                pos = (h1 + U64(i) * h2) & mask
                np.bitwise_or.at(bits, (pos >> U64(6)).astype(np.int64),
                                 U64(1) << (pos & U64(63)))
        return cls(bits, n_bits, k)

    # -- mergeable fixed-size partial API (distributed build) ------------
    # Per-block partial filters built inside map_batches fold on the
    # driver at #blocks x filter-size cost (the functions/cms.py pattern);
    # all partials must share n_bits/k, so callers pick a FIXED n_bits
    # sized for the expected total keys, not per-block counts.

    @classmethod
    def empty(cls, n_bits: int = 1 << 23, k: int = 7) -> "BloomFilter":
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        return cls(np.zeros(n_bits >> 6, dtype=U64), n_bits, k)

    def add(self, keys: np.ndarray) -> "BloomFilter":
        keys = np.asarray(keys).astype(U64, copy=False)
        if keys.size:
            h1 = splitmix64(keys)
            h2 = splitmix64(keys ^ _SEED2) | U64(1)
            mask = U64(self.n_bits - 1)
            for i in range(self.k):
                pos = (h1 + U64(i) * h2) & mask
                np.bitwise_or.at(self.bits,
                                 (pos >> U64(6)).astype(np.int64),
                                 U64(1) << (pos & U64(63)))
        return self

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        self.bits |= other.bits
        return self

    def tobytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def frombytes(cls, data: bytes, k: int) -> "BloomFilter":
        bits = np.frombuffer(data, dtype=U64).copy()
        return cls(bits, bits.size << 6, k)

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership mask — no false negatives, ~1% false
        positives at 10 bits/key."""
        v = np.asarray(values).astype(U64, copy=False)
        if v.size == 0:
            return np.zeros(0, dtype=bool)
        h1 = splitmix64(v)
        h2 = splitmix64(v ^ _SEED2) | U64(1)
        mask = U64(self.n_bits - 1)
        out = np.ones(v.size, dtype=bool)
        for i in range(self.k):
            pos = (h1 + U64(i) * h2) & mask
            word = self.bits[(pos >> U64(6)).astype(np.int64)]
            out &= (word >> (pos & U64(63))) & U64(1) != 0
        return out

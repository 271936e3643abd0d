"""Count-Min sketch + heavy-hitters over 64-bit keys.

Scale rationale: exact global token counts need a vocabulary-sized shuffle
(fine for [a-z0-9]+ web tokens, unbounded for raw byte n-grams or URLs at
10^12 docs). A Count-Min sketch is a FIXED-size (d×w int64) summary with a
one-sided guarantee — estimate ≥ true count, overshoot ≤ εN with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ — and merges by elementwise
addition, so per-block partial sketches combine associatively in a tiny
reduce (the same partial-combine shape as the KMV/bottom-k sketch, A5,
rabin/rabin_dedup.c's ~20k-min segment sketch). Heavy-hitter candidates are
tracked per block (local exact top-k) and re-estimated against the merged
sketch — a candidate set union never misses a global heavy hitter that is
a local one in at least one block (counts are non-negative).

All operations are whole-array numpy: d row positions come from double
hashing h1 + i·h2 (Kirsch-Mitzenmacher), updates are np.add.at scatters.
"""

from __future__ import annotations

import numpy as np

from pcompress_ray.hashing import splitmix64

U64 = np.uint64
_SEED2 = U64(0x9E3779B97F4A7C15)


class CountMinSketch:
    __slots__ = ("table", "d", "w")

    def __init__(self, table: np.ndarray):
        self.table = table
        self.d, self.w = table.shape

    @classmethod
    def empty(cls, w: int = 2048, d: int = 4) -> "CountMinSketch":
        return cls(np.zeros((d, w), dtype=np.int64))

    def _cols(self, keys: np.ndarray) -> np.ndarray:
        """(d, n) column indices for each key — double hashing."""
        k = keys.astype(U64, copy=False)
        h1 = splitmix64(k)
        h2 = splitmix64(k ^ _SEED2) | U64(1)
        i = np.arange(self.d, dtype=U64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % U64(self.w)).astype(np.int64)

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None):
        """Add counts (default 1 each) for an array of uint64 keys."""
        if keys.size == 0:
            return self
        cols = self._cols(keys)
        c = (np.ones(keys.size, np.int64) if counts is None
             else counts.astype(np.int64, copy=False))
        for r in range(self.d):
            np.add.at(self.table[r], cols[r], c)
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates (min over rows) — ≥ true count, always."""
        if keys.size == 0:
            return np.zeros(0, np.int64)
        cols = self._cols(keys)
        est = self.table[0][cols[0]].copy()
        for r in range(1, self.d):
            np.minimum(est, self.table[r][cols[r]], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Elementwise sum — exact for the combined stream (associative)."""
        if self.table.shape != other.table.shape:
            raise ValueError("sketch geometry mismatch")
        return CountMinSketch(self.table + other.table)


def heavy_hitters(sketch: CountMinSketch, candidates: np.ndarray,
                  k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k candidate keys by sketch estimate (est desc, key asc —
    deterministic). ``candidates`` is the union of per-block local top-k
    keys; any global heavy hitter is a local one somewhere, so the union
    covers it."""
    cand = np.unique(candidates.astype(U64, copy=False))
    est = sketch.estimate(cand)
    order = np.lexsort((cand, -est))[:k]
    return cand[order], est[order]

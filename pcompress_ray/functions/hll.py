"""HyperLogLog distinct-count sketch with an EXACTLY reproducible register
table (Flajolet et al. 2007).

Reference parity: pcompress sizes its similarity index from a cheap
cardinality summary of the segment key space (the segmented index keeps
~25 keys per 8 MB segment because the full key set cannot be held,
rabin/global/dedupe_config.c:299-390); HLL is the standard fixed-size
answer to "how many distinct keys does this corpus have" when the key
space is unbounded — 256 bytes summarize 10^12 tokens.

Determinism contract (the length_hist_quantiles pattern — the ORACLE
REPRODUCES THE SKETCH, not just its answer): token hash = first 16 hex
chars of sha256(token) as uint64; bucket = top 8 bits (m=256); rank =
position of the first 1-bit in the remaining 56 bits (57 when zero).
Every piece is exact-integer in both engines, so the DuckDB twin computes
the identical 256-row register table and the driver value-hash matches
bit for bit.  The cardinality ESTIMATE (alpha_m * m^2 / sum 2^-M[j]) is
float-valued and deliberately kept out of the oracle-checked output; the
pytest gate asserts its accuracy instead.

Scale shape: per-batch partial registers are a FIXED 256-byte array built
from the batch's unique tokens (hashlib over a vocab-sized set, not
positions); partials merge by elementwise max — a tiny groupby, no
vocabulary-sized shuffle, mergeable across any partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 8                    # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_W_BITS = 64 - HLL_P         # 56


def token_registers(tokens) -> np.ndarray:
    """256-entry max-rank register array from an iterable of tokens.

    Python iterates the batch's UNIQUE tokens only (hashlib is C); rank
    uses int.bit_length — exact at any magnitude, no float log2."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    for tok in set(tokens):
        h = int.from_bytes(
            hashlib.sha256(tok.encode("utf-8")).digest()[:8], "big")
        bucket = h >> _W_BITS
        w = h & ((1 << _W_BITS) - 1)
        rank = _W_BITS - w.bit_length() + 1
        if rank > regs[bucket]:
            regs[bucket] = rank
    return regs


def batch_hll_partial(t: pa.Table, token_re) -> pa.Table:
    """Fixed-size per-batch partial: 256 rows of (bucket, max_rank)."""
    toks: set = set()
    for txt in t["text"].to_pylist():
        toks.update(token_re.findall((txt or "").lower()))
    regs = token_registers(toks)
    return pa.table({"bucket": np.arange(HLL_M, dtype=np.int64),
                     "max_rank": regs})


def merge_registers(parts: pd.DataFrame) -> pd.DataFrame:
    """Elementwise max over partial register tables (one tiny groupby)."""
    g = parts.groupby("bucket", sort=True)["max_rank"].max().reset_index()
    return g


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the small-range linear-counting patch."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)

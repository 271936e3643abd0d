"""HLL sketch: register table == brute force, mergeability, estimate
accuracy on a known-cardinality vocabulary."""
import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pcompress_ray.functions.hll import (
    HLL_M, batch_hll_partial, hll_estimate, merge_registers, token_registers)

_TOK = re.compile(r"[a-z0-9]+")


def _brute_regs(tokens):
    regs = np.zeros(HLL_M, dtype=np.int64)
    for tok in set(tokens):
        h = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
        b, w = h >> 56, h & ((1 << 56) - 1)
        regs[b] = max(regs[b], 56 - w.bit_length() + 1)
    return regs


def test_registers_match_brute_and_merge():
    toks = [f"tok{i}" for i in range(5000)]
    regs = token_registers(toks)
    assert np.array_equal(regs, _brute_regs(toks))
    # mergeability: max of two halves == whole
    a = token_registers(toks[:2500])
    b = token_registers(toks[2500:])
    assert np.array_equal(np.maximum(a, b), regs)


def test_estimate_accuracy():
    # m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%; gate each draw at 3 sigma
    # and the mean absolute error over disjoint vocabularies at ~1 sigma.
    errs = []
    for true_n, salt in [(500, "a"), (20_000, "b"), (20_000, "c"),
                         (20_000, "d"), (5_000, "e")]:
        regs = token_registers([f"w{i}{salt}" for i in range(true_n)])
        est = hll_estimate(regs)
        rel = abs(est - true_n) / true_n
        assert rel < 0.20, (true_n, est)
        errs.append(rel)
    assert float(np.mean(errs)) < 0.08, errs


def test_batch_partial_shape_and_dedup():
    t = pa.table({"text": ["the cat the cat", "", None, "CAT the"]})
    out = batch_hll_partial(t, _TOK)
    assert len(out) == HLL_M
    regs = out["max_rank"].to_numpy()
    assert np.array_equal(regs, _brute_regs(["the", "cat"]))


def test_query_merge_is_columnwise_max():
    p1 = batch_hll_partial(pa.table({"text": ["alpha beta"]}), _TOK).to_pandas()
    p2 = batch_hll_partial(pa.table({"text": ["beta gamma"]}), _TOK).to_pandas()
    merged = merge_registers(pd.concat([p1, p2]))
    want = _brute_regs(["alpha", "beta", "gamma"])
    assert np.array_equal(merged.sort_values("bucket")["max_rank"].to_numpy(),
                          want)

"""Bloom prefilter incremental dedup: no false negatives, bounded FP rate,
mergeable partials, and end-to-end equality with exact dedup."""
import numpy as np
import pandas as pd
import pytest

from pcompress_ray.functions.bloom import BloomFilter


def test_fixed_size_partials_merge_equals_single_build():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    whole = BloomFilter.empty(1 << 16, 7).add(keys)
    a = BloomFilter.empty(1 << 16, 7).add(keys[:2500])
    b = BloomFilter.empty(1 << 16, 7).add(keys[2500:])
    merged = BloomFilter.frombytes(a.tobytes(), 7).merge(
        BloomFilter.frombytes(b.tobytes(), 7))
    assert np.array_equal(merged.bits, whole.bits)
    assert merged.contains(keys).all()  # no false negatives, ever


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**63, 10_000, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    bf = BloomFilter.empty(1 << 17, 7).add(keys)  # ~13 bits/key
    fp = bf.contains(other).mean()
    assert fp < 0.02, fp


def test_prefilter_pipeline_equals_exact(ray_session):
    import ray.data as rd

    from pcompress_ray.pipelines.incremental import bloom_prefilter_dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    store_txt = [" ".join(rng.choice(vocab, 12)) for _ in range(300)]
    # increment: 40 exact copies of store docs + 160 fresh docs
    new_txt = [store_txt[i * 7] for i in range(40)] + \
        [" ".join(rng.choice(vocab, 13)) for _ in range(160)]
    store = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "text": store_txt}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(1000, 1200, dtype=np.int64), "text": new_txt}))
    out = bloom_prefilter_dedup(new, store, n_bits=1 << 16, k=7,
                                n_parts=8).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    store_set = set(store_txt)
    want = np.array([int(t in store_set) for t in new_txt])
    assert np.array_equal(out["is_dup"].to_numpy(), want)
    # every true dup must have been flagged maybe (no false negatives)
    assert (out.loc[out["is_dup"] == 1, "bloom_maybe"] == 1).all()
    # the prefilter must actually prune: maybes well under the increment
    assert out["bloom_maybe"].sum() < 40 + 0.1 * 160

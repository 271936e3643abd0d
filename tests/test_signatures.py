"""Signature unit tests (FIXTURES F5): MinHash estimate vs true Jaccard,
shingle determinism, band-collision behavior, SimHash locality."""

import numpy as np

from pcompress_ray.config import PipelineConfig
from pcompress_ray.hashing import (
    combine_rows,
    hamming64,
    hash_strings,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash,
)
from pcompress_ray.stages.signatures import doc_shingles, exact_jaccard

CFG = PipelineConfig()


def test_hash_strings_deterministic():
    a = hash_strings(["foo", "bar", "foo"])
    b = hash_strings(["foo", "bar", "foo"])
    assert (a == b).all()
    assert a[0] == a[2] and a[0] != a[1]


def test_shingles_order_sensitive():
    t1 = hash_strings(list("abcdefgh"))
    s_fwd = shingle_hashes(t1, 3)
    s_rev = shingle_hashes(t1[::-1].copy(), 3)
    assert len(set(s_fwd.tolist()) & set(s_rev.tolist())) == 0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a_set = rng.integers(0, 1 << 63, 2000).astype(np.uint64)
    for target in (0.3, 0.7, 0.9):
        n_shared = int(2000 * 2 * target / (1 + target))
        b_set = np.concatenate([a_set[:n_shared],
                                rng.integers(0, 1 << 63, 2000 - n_shared).astype(np.uint64)])
        au, bu = np.unique(a_set), np.unique(b_set)
        true_j = exact_jaccard(au, bu)
        a, b = minhash_params(CFG.num_perm, CFG.minhash_seed)
        sa = minhash_signature(au, a, b)
        sb = minhash_signature(bu, a, b)
        est = (sa == sb).mean()
        assert abs(est - true_j) < 0.15, (target, true_j, est)


def test_band_collision_for_high_jaccard():
    """J≈0.95 pair must collide in ≥1 of 32 bands (w.h.p.); J≈0.05 must not."""
    rng = np.random.default_rng(1)
    base = np.unique(rng.integers(0, 1 << 63, 3000).astype(np.uint64))
    a, b = minhash_params(CFG.num_perm, CFG.minhash_seed)

    def bands_of(s):
        sig = minhash_signature(s, a, b).reshape(1, -1)
        return [int(combine_rows(sig[:, i * CFG.lsh_rows:(i + 1) * CFG.lsh_rows],
                                 seed=i + 1)[0]) for i in range(CFG.lsh_bands)]

    near = base[rng.random(base.size) > 0.03]  # J ≈ 0.97
    far = np.unique(rng.integers(0, 1 << 63, 3000).astype(np.uint64))
    b0, b1, b2 = bands_of(base), bands_of(near), bands_of(far)
    assert any(x == y for x, y in zip(b0, b1))
    assert not any(x == y for x, y in zip(b0, b2))


def test_doc_shingles_short_doc():
    s = doc_shingles("one two", CFG.shingle_k)  # < k tokens → whole-doc shingle
    assert s.size == 1
    assert doc_shingles("", CFG.shingle_k).size == 0
    s2 = doc_shingles("one two", CFG.shingle_k)
    assert (s == s2).all()


def test_simhash_locality():
    rng = np.random.default_rng(2)
    toks = [f"w{i}" for i in rng.integers(0, 5000, 800)]
    th = hash_strings(toks)
    h1 = simhash(th)
    toks2 = list(toks)
    for i in rng.integers(0, 800, 16):
        toks2[int(i)] = "sub"
    h2 = simhash(hash_strings(toks2))
    far = simhash(hash_strings([f"v{i}" for i in rng.integers(0, 5000, 800)]))
    d_near = hamming64(np.array([h1], dtype=np.uint64), np.array([h2], dtype=np.uint64))[0]
    d_far = hamming64(np.array([h1], dtype=np.uint64), np.array([far], dtype=np.uint64))[0]
    assert d_near <= 14 < d_far


def test_kmv_jaccard_many_matches_scalar():
    """Vectorized batch scorer == scalar kernel on ragged random sketches,
    covering empties, singletons, and k-saturated (estimate-path) pairs."""
    from pcompress_ray.stages.verify import kmv_jaccard, kmv_jaccard_many

    rng = np.random.default_rng(7)
    k = 16
    pool = np.unique(rng.integers(0, 1 << 40, 4000).astype(np.uint64))
    a_list, b_list = [], []
    for i in range(300):
        na = int(rng.integers(0, k + 5))
        nb = int(rng.integers(0, k + 5))
        a = np.sort(rng.choice(pool, min(na, pool.size), replace=False))
        # overlap half the time so intersections are non-trivial
        if i % 2 == 0 and a.size:
            extra = rng.choice(pool, min(nb, pool.size), replace=False)
            b = np.unique(np.concatenate([a[: a.size // 2], extra]))[:nb]
        else:
            b = np.sort(rng.choice(pool, min(nb, pool.size), replace=False))
        a_list.append(a)
        b_list.append(b)
    a_lens = np.array([x.size for x in a_list], dtype=np.int64)
    b_lens = np.array([x.size for x in b_list], dtype=np.int64)
    got = kmv_jaccard_many(
        np.concatenate(a_list) if a_lens.sum() else np.empty(0, np.uint64),
        a_lens,
        np.concatenate(b_list) if b_lens.sum() else np.empty(0, np.uint64),
        b_lens, k)
    want = np.array([kmv_jaccard(a, b, k) for a, b in zip(a_list, b_list)])
    assert np.allclose(got, want)
    assert (a_lens >= k).any() or (b_lens >= k).any()  # estimate path hit

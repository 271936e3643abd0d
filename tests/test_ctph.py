"""CTPH kernel oracles: the vectorized digest equals a byte-at-a-time
pure-Python reference; edit distance equals a textbook DP; the distributed
fuzzy-match finds planted near-identical docs and nothing else."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.ctph import (
    _B64,
    _DIGEST_LEN,
    _MIN_BLOCK,
    _POLY_B,
    _WIN,
    _levenshtein,
    blocksize_for,
    ctph_digest,
    ctph_score,
)
from pcompress_ray.hashing import splitmix64

M64 = (1 << 64) - 1


def _ref_digest(data: bytes, bs: int) -> str:
    """Byte-at-a-time reference: rolling trigger + per-piece poly hash."""
    n = len(data)
    if n == 0:
        return ""
    win = [0] * _WIN
    triggers = []
    for i, c in enumerate(data):
        win = win[1:] + [c]
        h1 = sum(win)
        h2 = sum((_WIN - k) * win[_WIN - 1 - k] for k in range(_WIN))
        h3 = 0
        for k in range(_WIN):
            h3 ^= (win[_WIN - 1 - k] << (5 * k)) & M64
        if (h1 + h2 + h3) % bs == bs - 1:
            triggers.append(i + 1)
    triggers = triggers[:_DIGEST_LEN - 1]
    ends = triggers + ([n] if (not triggers or triggers[-1] != n) else [])
    out = []
    s = 0
    binv = pow(int(_POLY_B), -1, 1 << 64)
    for e in ends:
        poly = 0
        for j in range(s, e):
            poly = (poly + data[j] * pow(binv, j - s, 1 << 64)) & M64
        h = int(splitmix64(np.uint64(poly)))
        out.append(chr(_B64[h & 63]))
        s = e
    return "".join(out)


def test_digest_matches_pure_python_reference():
    rng = np.random.default_rng(3)
    for n in (0, 1, 5, 7, 40, 300, 2000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        b, d1, d2 = ctph_digest(data)
        assert b == blocksize_for(n)
        assert d1 == _ref_digest(data, b)
        assert d2 == _ref_digest(data, 2 * b)


def test_blocksize_rule():
    assert blocksize_for(0) == _MIN_BLOCK
    assert blocksize_for(_MIN_BLOCK * 64) == _MIN_BLOCK
    assert blocksize_for(_MIN_BLOCK * 64 + 1) == _MIN_BLOCK * 2
    assert blocksize_for(10**6) >= 10**6 / 64


def test_levenshtein_matches_dp():
    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            nd = [i + 1]
            for j, cb in enumerate(b):
                nd.append(min(dp[j] + (ca != cb), dp[j + 1] + 1,
                              nd[-1] + 1))
            dp = nd
        return dp[-1]

    rng = np.random.default_rng(4)
    alpha = "abcd"
    for _ in range(40):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        assert _levenshtein(a, b) == ref(a, b), (a, b)
    assert _levenshtein("", "xyz") == 3
    assert _levenshtein("kitten", "sitting") == 3


def test_score_identity_and_guard():
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(97, 123, 3000, dtype=np.uint8))
    _, d1, _ = ctph_digest(data)
    assert ctph_score(d1, d1) == 100
    # digests shorter than the 7-gram guard only match exactly
    assert ctph_score("abc", "abc") == 100
    assert ctph_score("abc", "abd") == 0
    assert ctph_score("", "") == 0


def test_distributed_fuzzy_match_finds_planted_neardups():
    import ray.data as rd

    from pcompress_ray.stages.ctph import ctph_candidate_pairs, ctph_digest_batch

    rng = np.random.default_rng(6)
    base = rng.integers(97, 123, 4000, dtype=np.uint8)
    mut = base.copy()
    # one clustered 150-byte rewrite: CTPH is piecewise, so a localized
    # edit flips only the pieces it touches (uniform 1% noise would flip
    # nearly every ~96-byte piece — faithful ssdeep behavior, not a match)
    mut[1000:1150] = rng.integers(97, 123, 150, dtype=np.uint8)
    other = rng.integers(97, 123, 4000, dtype=np.uint8)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([bytes(base).decode(), bytes(mut).decode(),
                          bytes(other).decode(), bytes(base).decode()]),
    })
    sigs = rd.from_arrow(docs).repartition(2) \
        .map_batches(ctph_digest_batch, batch_format="pyarrow")
    out = ctph_candidate_pairs(sigs, min_score=60, n_parts=4).to_pandas()
    pairs = {tuple(sorted(p)) for p in zip(out.doc_a, out.doc_b)}
    assert (0, 3) in pairs                      # identical -> score 100
    assert (0, 1) in pairs and (1, 3) in pairs  # 1% edits -> high score
    assert not any(2 in p for p in pairs)       # unrelated never matches
    s = out.set_index(["doc_a", "doc_b"])["score"]
    exact = s.get((0, 3), s.get((3, 0)))
    assert int(exact) == 100


def test_no_candidates_returns_typed_empty():
    import ray.data as rd

    from pcompress_ray.stages.ctph import ctph_candidate_pairs, ctph_digest_batch

    docs = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                     "text": pa.array(["tiny one", "other two"])})
    sigs = rd.from_arrow(docs).repartition(2) \
        .map_batches(ctph_digest_batch, batch_format="pyarrow")
    out = ctph_candidate_pairs(sigs, n_parts=2)
    assert out.count() == 0
    # Dataset keeps the typed schema (ray's to_pandas drops cols at 0 rows)
    assert out.schema().names == ["doc_a", "doc_b", "blocksize", "score"]

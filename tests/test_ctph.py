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


def test_batch_kernels_match_scalar_twins():
    """ctph_score_batch / _levenshtein_batch / ctph_compare_batch are
    bit-identical to their per-pair scalar twins on random inputs."""
    from pcompress_ray.stages.ctph import (
        _levenshtein_batch,
        _pack_ascii,
        ctph_compare,
        ctph_compare_batch,
        ctph_score_batch,
    )

    rng = np.random.default_rng(11)
    alpha = list("ABCDEFab+/")

    def rs(maxlen):
        return "".join(rng.choice(alpha, rng.integers(0, maxlen)))

    pairs = [(rs(30), rs(30)) for _ in range(150)] + \
        [("", ""), ("abc", "abc"), ("abc", "abd"), ("", "xy")]
    A, la = _pack_ascii([p[0] for p in pairs])
    B, lb = _pack_ascii([p[1] for p in pairs])
    assert (_levenshtein_batch(A, la, B, lb)
            == np.array([_levenshtein(a, b) for a, b in pairs])).all()
    s = ctph_score_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert (s == np.array([ctph_score(a, b) for a, b in pairs])).all()
    # shared-7-gram pairs exercise the guarded DP path
    core = rs(40) + "SHAREDGRAM" + rs(10)
    pg = [(core, core[:20] + "SHAREDGRAM" + rs(25)) for _ in range(60)]
    sg = ctph_score_batch([p[0] for p in pg], [p[1] for p in pg])
    assert (sg == np.array([ctph_score(a, b) for a, b in pg])).all()

    n = 200
    bs_a = rng.choice([3, 6, 12, 24], n).astype(np.int64)
    bs_b = (bs_a * rng.choice([1, 1, 2, 4], n)).astype(np.int64)
    d1a, d2a = [rs(64) for _ in range(n)], [rs(32) for _ in range(n)]
    d1b, d2b = [rs(64) for _ in range(n)], [rs(32) for _ in range(n)]
    sc, scl = ctph_compare_batch(bs_a, d1a, d2a, bs_b, d1b, d2b)
    for i in range(n):
        assert (int(sc[i]), int(scl[i])) == ctph_compare(
            int(bs_a[i]), d1a[i], d2a[i], int(bs_b[i]), d1b[i], d2b[i])


def test_gram_keys_match_pure_python():
    """_digest_gram_keys emits exactly the distinct (scale, 7-gram) set
    per doc (collision-free 6-bit packing, not a lossy hash)."""
    from pcompress_ray.stages.ctph import _digest_gram_keys

    rng = np.random.default_rng(12)
    alpha = [chr(c) for c in _B64]
    digs = ["".join(rng.choice(alpha, rng.integers(0, 64)))
            for _ in range(20)]
    ids = np.arange(20, dtype=np.int64)
    scales = np.asarray(3 * 2 ** rng.integers(0, 8, 20), np.int64)
    keys, kids = _digest_gram_keys(ids, digs, scales)
    ref = set()
    for i, (d, s) in enumerate(zip(digs, scales)):
        for j in range(max(0, len(d) - 6)):
            ref.add((i, int(s), d[j:j + 7]))
    assert len(keys) == len(ref)
    assert len(set(zip(kids.tolist(), keys.tolist()))) == len(keys)
    # per-doc counts agree with the reference set
    got = {i: 0 for i in range(20)}
    for i in kids:
        got[int(i)] += 1
    want = {i: 0 for i in range(20)}
    for i, _, _ in ref:
        want[i] += 1
    assert got == want


def test_cross_blocksize_neardups_match():
    """ssdeep's adjacent-blocksize rule: a near-dup pair whose sizes
    straddle a blocksize boundary (one digests at b, the other at 2b)
    still matches via the 2b digest — a digest-only bucketing finds
    nothing here (ADVICE r3: digest2 was computed but never used)."""
    import ray.data as rd

    from pcompress_ray.stages.ctph import (
        ctph_candidate_pairs,
        ctph_digest_batch,
    )

    rng = np.random.default_rng(13)
    base = rng.integers(97, 123, 12288, dtype=np.uint8)   # b = 192 exactly
    ext = np.concatenate([base,
                          rng.integers(97, 123, 200, dtype=np.uint8)])
    assert blocksize_for(base.size) == 192
    assert blocksize_for(ext.size) == 384
    other = rng.integers(97, 123, 12288, dtype=np.uint8)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([bytes(base).decode(), bytes(ext).decode(),
                          bytes(other).decode()]),
    })
    sigs = rd.from_arrow(docs).repartition(2) \
        .map_batches(ctph_digest_batch, batch_format="pyarrow")
    out = ctph_candidate_pairs(sigs, min_score=60, n_parts=4).to_pandas()
    pairs = {tuple(sorted(p)) for p in zip(out.doc_a, out.doc_b)}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    row = out[(out.doc_a.isin([0, 1])) & (out.doc_b.isin([0, 1]))].iloc[0]
    assert int(row.blocksize) == 384        # matched at the shared scale
    assert int(row.score) >= 60


def test_ctph_pairs_parallelism_invariant(ray_session):
    """The matcher's output is a pure function of the corpus — identical
    pair set and scores at different block splits and partition counts
    (T5 canonical-order discipline applied to the fuzzy matcher)."""
    import ray.data as rd

    from pcompress_ray.stages.ctph import ctph_candidate_pairs, ctph_digest_batch

    rng = np.random.default_rng(31)
    texts = []
    base = rng.integers(97, 123, 3000, dtype=np.uint8)
    for i in range(12):
        v = base.copy()
        v[i * 37 : i * 37 + 60] = rng.integers(97, 123, 60, dtype=np.uint8)
        texts.append(bytes(v).decode())
    texts += ["".join(map(chr, rng.integers(97, 123, 3000))) for _ in range(4)]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})

    def run(nblocks, nparts):
        sigs = rd.from_arrow(docs).repartition(nblocks) \
            .map_batches(ctph_digest_batch, batch_format="pyarrow")
        out = ctph_candidate_pairs(sigs, min_score=60,
                                   n_parts=nparts).to_pandas()
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    a = run(1, 2)
    b = run(5, 16)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0

"""Context-triggered piecewise hashing (CTPH, ssdeep-STYLE) fuzzy digests.

Reference parity: pcompress finds duplicate and similar regions with a
rolling-hash content-defined chunker plus per-chunk digests
(rabin/rabin_dedup.c window scan + per-block fingerprints); CTPH is the
same idea folded into a tiny per-document signature — a rolling hash
triggers piece boundaries, each piece contributes ONE base64 character,
and two documents are fuzzy-matched by comparing their ≤64-char digest
strings (Kornblum 2006, "Identifying almost identical files using context
triggered piecewise hashing"). This implementation is ssdeep-INSPIRED, not
bit-compatible: the trigger window combines the same h1/h2/h3 shapes but
the piece hash is a 64-bit polynomial + splitmix64 finalizer chosen so the
whole per-document scan vectorizes in numpy (no per-byte Python).

Scale shape: digesting is embarrassingly parallel map_batches; matching is
the standard explode-ngram → hash-partitioned bucket pairs → bounded
verify (≤64×64 edit-distance DP per candidate) — identical skeleton to
the MinHash/SimHash candidate paths in stages/candidates.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.hashing import splitmix64

_B64 = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8)
_WIN = 7
_MIN_BLOCK = 3
_DIGEST_LEN = 64          # max chars per digest (ssdeep's spamsum length)
_POLY_B = np.uint64(0x9E3779B97F4A7C15 | 1)   # odd -> invertible mod 2^64


def _rolling_trigger(data: np.ndarray) -> np.ndarray:
    """uint64 rolling-hash value at every byte position (window = 7).

    h1 = window byte sum; h2 = position-weighted window sum (newest
    weight 7); h3 = xor of window bytes shifted 5 bits per step of age.
    Positions before a full window use zero-padding (deterministic).
    """
    c = data.astype(np.uint64)
    n = c.size
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    h3 = np.zeros(n, np.uint64)
    for k in range(_WIN):
        if k == 0:
            sh = c
        else:
            sh = np.zeros(n, np.uint64)
            if k < n:
                sh[k:] = c[:-k]
        h1 += sh
        h2 += np.uint64(_WIN - k) * sh
        h3 ^= sh << np.uint64(5 * k)
    return h1 + h2 + h3


def _piece_chars(data: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """One base64 char per piece [start, end) via a 64-bit polynomial hash
    computed from prefix sums (vectorized over all pieces at once).

    Q[i] = sum_{j<i} c_j * Binv^j  (wraparound uint64); the piece poly is
    (Q[e]-Q[s]) * B^s = sum_{j=s..e-1} c_j * Binv^(j-s) — a polynomial in
    Binv, position-sensitive and prefix-computable — then splitmix64-
    finalized and mapped to the base64 alphabet.
    """
    c = data.astype(np.uint64)
    n = c.size
    binv = pow(int(_POLY_B), -1, 1 << 64)
    pows_inv = np.cumprod(
        np.concatenate([[np.uint64(1)], np.full(n - 1, np.uint64(binv))])
        if n else np.empty(0, np.uint64), dtype=np.uint64) \
        if n else np.empty(0, np.uint64)
    pows_fwd = np.cumprod(
        np.concatenate([[np.uint64(1)], np.full(n - 1, _POLY_B)])
        if n else np.empty(0, np.uint64), dtype=np.uint64) \
        if n else np.empty(0, np.uint64)
    q = np.zeros(n + 1, np.uint64)
    if n:
        np.cumsum(c * pows_inv, out=q[1:])
    starts = np.concatenate([[0], ends[:-1]])
    piece = (q[ends] - q[starts]) * pows_fwd[starts]
    return _B64[(splitmix64(piece) & np.uint64(63)).astype(np.int64)]


def blocksize_for(n: int) -> int:
    """Smallest b = 3 * 2^i with b * 64 >= n (the ssdeep blocksize rule)."""
    b = _MIN_BLOCK
    while b * _DIGEST_LEN < n:
        b *= 2
    return b


def ctph_digest(data: bytes) -> tuple[int, str, str]:
    """(blocksize, digest@b, digest@2b) for one byte string.

    Each digest caps at 64 chars by keeping the LAST piece open (ssdeep
    semantics: the tail collapses into the final character).
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    b = blocksize_for(arr.size)
    if arr.size == 0:
        return b, "", ""
    rh = _rolling_trigger(arr)
    out = []
    for bs in (b, 2 * b):
        trig = np.flatnonzero(rh % np.uint64(bs) == np.uint64(bs - 1)) + 1
        trig = trig[:_DIGEST_LEN - 1]          # cap: tail is one piece
        ends = np.concatenate([trig, [arr.size]]) \
            if (trig.size == 0 or trig[-1] != arr.size) \
            else trig
        ends = ends.astype(np.int64)
        out.append(_piece_chars(arr, ends).tobytes().decode("ascii"))
    return b, out[0], out[1]


def ctph_digest_batch(t: pa.Table, data_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """map_batches stage: (doc_id, data) -> (doc_id, blocksize, digest,
    digest2). String columns are digested as their utf-8 bytes."""
    t = t.replace_schema_metadata(None)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t[data_col].to_pylist()
    bs = np.empty(len(vals), np.int64)
    d1, d2 = [], []
    for i, v in enumerate(vals):
        raw = (v or "").encode("utf-8") if isinstance(v, str) or v is None \
            else bytes(v)
        b, a, c = ctph_digest(raw)
        bs[i] = b
        d1.append(a)
        d2.append(c)
    return pa.table({"doc_id": pa.array(ids),
                     "blocksize": pa.array(bs),
                     "digest": pa.array(d1, pa.string()),
                     "digest2": pa.array(d2, pa.string())})


def _levenshtein(a: str, b: str) -> int:
    """Edit distance via the classic DP, one numpy row at a time (inputs
    are <= 64 chars, so this is a bounded kernel, not a hot loop)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b.encode("ascii"), np.uint8)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ch in enumerate(a.encode("ascii")):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        cur[1:] = np.minimum(prev[:-1] + (bv != ch), prev[1:] + 1)
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1, cur[j-2]+2, ...)
        # == idx[j] + running_min(cur - idx), one accumulate pass
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        prev = cur
    return int(prev[-1])


def ctph_score(d1: str, d2: str) -> int:
    """0-100 match score between two same-blocksize digests: scaled
    (1 - editdist / max_len); 0 unless they share a 7-char substring
    (Kornblum's guard against coincidental low distances)."""
    if not d1 or not d2:
        return 0
    if not _has_common_ngram(d1, d2, 7):
        return 0
    dist = _levenshtein(d1, d2)
    m = max(len(d1), len(d2))
    return int(round(100.0 * (1.0 - dist / m)))


def _has_common_ngram(a: str, b: str, n: int) -> bool:
    if len(a) < n or len(b) < n:
        return a == b and len(a) > 0
    grams = {a[i:i + n] for i in range(len(a) - n + 1)}
    return any(b[i:i + n] in grams for i in range(len(b) - n + 1))


def _digest_ngrams(part_ids, digests, blocksizes, n=7):
    out_key, out_id = [], []
    for i, d in enumerate(digests):
        if len(d) < n:
            continue
        seen = set()
        for j in range(len(d) - n + 1):
            g = d[j:j + n]
            if g not in seen:
                seen.add(g)
                out_key.append(f"{blocksizes[i]}|{g}")
                out_id.append(part_ids[i])
    return out_key, out_id


def ctph_candidate_pairs(sig_ds, min_score: int = 60, n_parts: int = 32):
    """Digest Dataset (from ctph_digest_batch) -> fuzzy-match pairs
    (doc_a, doc_b, blocksize, score) with score >= min_score.

    Bucket by (blocksize, digest 7-gram) — only same-blocksize docs can
    match, mirroring ssdeep's comparison rule — then verify each candidate
    pair once with the bounded edit-distance kernel. Pair dedup across
    buckets rides an (a, b)-keyed exchange, and the digests needed for
    verification are JOINED BACK per side (two partitioned hash joins)
    rather than broadcast from the driver — no full digest-table driver
    pull, so the operator keeps its shape at any corpus size.
    """
    from pcompress_ray.functions.ops import grouped_partitions, hash_join

    sigs = sig_ds.materialize()

    def explode(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key, did = _digest_ngrams(ids, t["digest"].to_pylist(),
                                  t["blocksize"].to_numpy(
                                      zero_copy_only=False))
        return pa.table({"gram": pa.array(key, pa.string()),
                         "doc_id": pa.array(np.asarray(did, np.int64))})

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        part = part.drop_duplicates(["gram", "doc_id"]) \
            .sort_values(["gram", "doc_id"], kind="stable")
        g = part["gram"].to_numpy()
        ids = part["doc_id"].to_numpy(np.int64)
        first = np.empty(len(part), bool)
        first[0] = True
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(part)))
        out_a, out_b = [], []
        for s, m in zip(starts, sizes):
            if m < 2:
                continue
            seg = ids[s:s + int(m)]
            ai, bi = np.triu_indices(int(m), k=1)
            out_a.append(seg[ai])
            out_b.append(seg[bi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({"a": np.concatenate(out_a),
                           "b": np.concatenate(out_b)})
        return df.drop_duplicates()

    cands = grouped_partitions(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["gram"], bucket_pairs, n_parts=n_parts)

    # global pair dedup FIRST (bounds the join amplification), then join
    # each side's digest back in
    def dedupe(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(["a", "b"])

    pairs = grouped_partitions(cands, ["a", "b"], dedupe,
                               n_parts=n_parts).materialize()
    if pairs.count() == 0:
        # nothing shares a digest 7-gram: short-circuit (an all-empty
        # Dataset has no schema, which a join can't consume)
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "blocksize": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))
    side = sigs.select_columns(["doc_id", "digest", "blocksize"])
    j = hash_join(pairs, side, "a", "doc_id")
    j = hash_join(j, side, "b", "doc_id", suffix="_b")

    def score(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["digest"].to_pylist()
        db = t["digest_b"].to_pylist()
        bs = t["blocksize"].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = np.fromiter((ctph_score(x, y) for x, y in zip(da, db)),
                         np.int64, len(t))
        keep = sc >= min_score
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "blocksize": pa.array(bs[keep]),
                         "score": pa.array(sc[keep])})

    return j.map_batches(score, batch_format="pyarrow")

"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the standard recipe for picking pretraining documents
whose hashed-n-gram distribution matches a small curated target set.

Three streaming pieces, each in the engine's established 100-TB shape:

1. ``fit_hashed_ngram_counts`` — ONE pass over a corpus producing a
   fixed-size ``int64[n_buckets]`` count vector of hashed unigram+bigram
   occurrences (per-block partial ``np.bincount`` folded on the driver,
   exactly the bloom/kmeans/CMS partial pattern — no shuffle, driver
   state is ``n_buckets * 8`` bytes regardless of corpus size).
2. ``dsir_scores`` — broadcast the e6-quantized log-likelihood-ratio
   vector (``ray.put`` once) and score every document in a single
   ``map_batches`` pass: ``score_e6 = sum(llr_e6[bucket(g)] for g in
   doc_ngrams)`` (integer sum of pre-quantized contributions, so the
   result is exact and summation-order-free — the bm25 trick,
   stages/search.py).
3. ``gumbel_key_e6`` — deterministic Gumbel top-k resampling key
   (sampling without replacement with probability proportional to the
   importance weight ``exp(score)``): ``key = score_e6 +
   floor(1e6 * -ln(-ln(u)) + 0.5)`` where ``u`` is an md5-derived
   uniform in (0,1) keyed by ``(doc_id, seed)`` — no RNG state, so an
   ANSI-SQL twin reproduces the selection row for row.

Hash features are md5-derived (leading-16-hex uint64 mod ``n_buckets``),
the same content-derived construction as stages/candidates.md5_simhash,
so every bucket id — and therefore every count, ratio, score and sampled
id — has an exact DuckDB twin. Reference analog: pcompress selects the
dedup/compression algorithm per segment by analyzing content statistics
(adaptive mode, pcompress.c adaptive selector); DSIR is the corpus-level
version of "weigh content by how much it looks like what you want".
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.textstats import tokenize_alnum

N_BUCKETS = 8192


_MEMO_CAP = 1 << 20   # per-worker memo entries; unigram vocab only


def _bucket_of(g: str, n_buckets: int, memo: dict) -> int:
    b = memo.get(g)
    if b is None:
        b = int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % n_buckets
        if len(memo) < _MEMO_CAP:
            memo[g] = b
    return b


def _batch_buckets(texts, n_buckets: int, memo: dict):
    """Tokenize a batch (Arrow string array) and hash unigram+bigram
    occurrences to buckets.

    Returns (buckets int64[total_ngrams], starts intp[n_docs],
    n_ngrams int64[n_docs]): ``np.add.reduceat(x[buckets], starts)``
    then gives per-doc sums. Tokenization is Arrow-vectorized
    (textstats.tokenize_alnum); md5 is taken once per DISTINCT n-gram in the
    batch (np.unique + integer-key bigram dedup), with a capped
    per-worker memo for UNIGRAMS only — bigram vocabulary grows with
    the corpus, so caching it would let a long-lived worker's memo grow
    unboundedly. Zero-token docs contribute an empty segment; within a
    doc, unigram buckets precede bigram buckets (stable doc sort), as
    in the original per-doc loop.
    """
    doc, words, n_docs = tokenize_alnum(texts)
    uniq, inv = np.unique(words, return_inverse=True)
    ub = np.fromiter((_bucket_of(w, n_buckets, memo) for w in uniq),
                     np.int64, len(uniq))
    uni_b = ub[inv] if len(inv) else np.empty(0, np.int64)
    # bigrams: adjacent within-doc token pairs, deduped by integer pair
    # key so md5 runs once per distinct bigram in the batch
    adj = doc[1:] == doc[:-1] if len(doc) else np.empty(0, bool)
    bl, br, bdoc = inv[:-1][adj], inv[1:][adj], doc[1:][adj]
    if len(bl):
        v = len(uniq)
        ukey, binv = np.unique(bl * v + br, return_inverse=True)
        ubb = np.fromiter(
            (int(hashlib.md5((uniq[k // v] + " " + uniq[k % v]).encode())
                 .hexdigest()[:16], 16) % n_buckets for k in ukey),
            np.int64, len(ukey))
        bi_b = ubb[binv]
    else:
        bi_b = np.empty(0, np.int64)
    all_doc = np.concatenate([doc, bdoc])
    all_b = np.concatenate([uni_b, bi_b])
    order = np.argsort(all_doc, kind="stable")
    n = np.bincount(all_doc, minlength=n_docs).astype(np.int64)
    starts = np.concatenate(
        [[0], np.cumsum(n)[:-1]]).astype(np.intp)
    return all_b[order], starts, n


def fit_hashed_ngram_counts(ds, text_col: str = "text",
                            n_buckets: int = N_BUCKETS) -> np.ndarray:
    """ONE streaming pass -> int64[n_buckets] hashed-n-gram occurrence
    counts. Fixed-size per-block partials, driver fold (bounded:
    #blocks x n_buckets x 8 bytes in flight, n_buckets x 8 held)."""

    def partial(t: pa.Table) -> pa.Table:
        b, _, _ = _batch_buckets(t[text_col], n_buckets, {})
        cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({"counts": pa.array([cnt.tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        # intermediate combine tier: driver ingress is #blocks/64 partials
        # instead of #blocks (at 10^6 input blocks that is 1 GB -> 16 MB)
        acc = np.zeros(n_buckets, np.int64)
        for buf in t["counts"].to_pylist():
            acc += np.frombuffer(buf, np.int64)
        return pa.table({"counts": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .map_batches(combine, batch_format="pyarrow", batch_size=64) \
        .take_all()
    total = np.zeros(n_buckets, np.int64)
    for row in parts:
        total += np.frombuffer(row["counts"], np.int64)
    return total


def dsir_log_ratio_e6(target_counts: np.ndarray,
                      raw_counts: np.ndarray) -> np.ndarray:
    """Laplace-smoothed per-bucket log-likelihood ratio, e6-quantized to
    int64 so downstream per-doc sums are integer-exact and order-free:
    ``floor(1e6 * (ln p_target[b] - ln p_raw[b]) + 0.5)``."""
    nb = len(target_counts)
    lt = np.log((target_counts + 1.0) / (target_counts.sum() + nb))
    lr = np.log((raw_counts + 1.0) / (raw_counts.sum() + nb))
    return np.floor((lt - lr) * 1e6 + 0.5).astype(np.int64)


def dsir_scores(ds, llr_e6: np.ndarray, id_col: str = "doc_id",
                text_col: str = "text",
                n_buckets: int = N_BUCKETS):
    """Score every document in one map pass against the broadcast
    contribution vector: (id_col, n_ngrams, score_e6). Zero-n-gram docs
    score 0. The vector ships once via ``ray.put``; each worker reads it
    zero-copy from plasma."""
    import ray

    ref = ray.put(np.ascontiguousarray(llr_e6, dtype=np.int64))

    def score(t: pa.Table, _cache: dict = {}) -> pa.Table:
        # worker-cached broadcast state + md5 memo (stateful-stage
        # pattern: fetched from plasma once per worker, not per batch)
        llr = _cache.get("llr")
        if llr is None:
            llr = _cache["llr"] = ray.get(ref)
            _cache["memo"] = {}
        t = t.replace_schema_metadata(None)
        b, starts, n = _batch_buckets(t[text_col], n_buckets,
                                      _cache["memo"])
        if len(b):
            # reduceat rejects an index == len (trailing zero-n-gram doc)
            # and returns the NEXT element for empty segments; clip the
            # offsets and zero every empty segment via the n>0 mask
            sums = np.add.reduceat(llr[b], np.minimum(starts, len(b) - 1))
            sums = np.where(n > 0, sums, 0)
        else:
            sums = np.zeros(len(n), np.int64)
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "n_ngrams": pa.array(n.astype(np.int64)),
            "score_e6": pa.array(sums.astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def gumbel_key_e6(doc_ids: np.ndarray, score_e6: np.ndarray,
                  seed: int = 0) -> np.ndarray:
    """Deterministic Gumbel top-k resampling key (int64): md5-derived
    uniform u = (h + 0.5) / 2^64 keyed by "{doc_id}:{seed}", then
    ``score_e6 + floor(1e6 * -ln(-ln(u)) + 0.5)``. Selecting the k
    largest keys samples k docs without replacement with probability
    proportional to exp(score) (Gumbel-max)."""
    h = np.array([int(hashlib.md5(f"{int(d)}:{seed}".encode())
                      .hexdigest()[:16], 16) for d in doc_ids],
                 dtype=np.uint64)
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
    g = -np.log(-np.log(u))
    return score_e6.astype(np.int64) + \
        np.floor(g * 1e6 + 0.5).astype(np.int64)


def dsir_resample(scored_ds, k: int, id_col: str = "doc_id",
                  seed: int = 0):
    """Gumbel top-k selection over a scored Dataset: attach the
    deterministic key per batch (stateless map), then a global
    descending sort + limit — the engine's standard total-order top-k
    (O3). Returns (id_col, score_e6, key_e6) for the k selected docs."""

    def attach(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = t["score_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids),
            "score_e6": pa.array(sc),
            "key_e6": pa.array(gumbel_key_e6(ids, sc, seed)),
        })

    return scored_ds.map_batches(attach, batch_format="pyarrow") \
        .sort(["key_e6", id_col], descending=[True, False]).limit(k)

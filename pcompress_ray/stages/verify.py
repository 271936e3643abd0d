"""Candidate-pair verification.

Analog of the reference's match confirmation: exact matches require
hash+length+memcmp (rabin/rabin_dedup.c:1347-1366), similarity matches
require sketch equality plus constraints (rabin/rabin_dedup.c:1368-1396).
Here a candidate pair (a,b) from LSH is verified by computing Jaccard from
the docs' bottom-k (KMV) shingle sketches — EXACT when both shingle sets fit
within k (the common case for web pages with k=1024), a bottom-k estimate
otherwise. This avoids the MinHash-signature estimator's ±1/√P noise at the
decision threshold, which would cost recall on borderline pairs.

The pair→sketch join is the partitioned hash join from functions/ops (pairs
are O(duplicates), signatures are O(corpus); both sides shuffle only once).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.config import PipelineConfig
from pcompress_ray.functions.ops import hash_join


def kmv_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Jaccard from two bottom-k sketches of sorted-unique shingle hashes.

    If both sketches are complete sets (size < k) → exact Jaccard.
    Else: bottom-k of the union, J ≈ |{x in bottom-k(A∪B)} ∩ A ∩ B| / k'.
    """
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    if a.size < k and b.size < k:
        inter = np.intersect1d(a, b, assume_unique=True).size
        return inter / (a.size + b.size - inter)
    union = np.union1d(a, b)[:k]
    inter = np.intersect1d(np.intersect1d(union, a, assume_unique=True), b,
                           assume_unique=True).size
    return inter / union.size


def _participating_ids(cand_ds) -> np.ndarray:
    pdf = cand_ds.select_columns(["a", "b"]).to_pandas()
    return np.unique(np.concatenate([pdf["a"].to_numpy(dtype=np.int64),
                                     pdf["b"].to_numpy(dtype=np.int64)]))


def verify_candidates(cand_ds, sig_ds, cfg: PipelineConfig):
    """Attach both sides' KMV sketches and keep pairs with J ≥ threshold.

    Returns edges (a, b, kind='near', jaccard:float64).

    Fast path: the participating docs' sketches are packed into ONE
    broadcast CSR-style store (ids, offsets, values) — ray.put once,
    zero-copy numpy views in every task — and pairs are verified by a
    single map_batches with two binary-search lookups per pair. No per-pair
    sketch duplication, no shuffle. Falls back to two partitioned hash
    joins when the participating-sketch payload exceeds the broadcast
    budget (then each pair carries its sketches through the exchanges).
    """
    n_pairs = cand_ds.count()
    if n_pairs == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64()),
                                       "kind": pa.array([], pa.string()),
                                       "jaccard": pa.array([], pa.float64())}))

    broadcast_budget = getattr(cfg, "verify_broadcast_bytes", 8 << 30)
    ids = _participating_ids(cand_ds) if n_pairs <= 50_000_000 else None
    if ids is not None and ids.size * cfg.kmv_k * 8 <= broadcast_budget:
        return _verify_broadcast(cand_ds, sig_ds, cfg, ids)
    return _verify_join(cand_ds, sig_ds, cfg, ids)


def _verify_broadcast(cand_ds, sig_ds, cfg: PipelineConfig, ids: np.ndarray):
    import ray

    ids_ref = ray.put(ids)

    def pick(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        sorted_ids = ray.get(ids_ref)
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sorted_ids, r)
        idx_c = np.minimum(idx, sorted_ids.size - 1)
        return t.filter(pa.array(sorted_ids[idx_c] == r))

    # Arrow-native store build: pull the binary column's value buffer
    # directly (no python bytes objects), then one gather into rank order.
    r_parts, l_parts, v_parts = [], [], []
    sk_ds = sig_ds.select_columns(["rank", "kmv"]) \
                  .map_batches(pick, batch_format="pyarrow")
    for t in sk_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t) == 0:
            continue
        arr = t["kmv"].combine_chunks()
        voff = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
        buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        r_parts.append(t["rank"].to_numpy(zero_copy_only=False).astype(np.int64))
        l_parts.append(np.diff(voff) // 8)
        v_parts.append(buf[voff[0] : voff[-1]].view(np.uint64))
    if r_parts:
        ranks_u = np.concatenate(r_parts)
        lens_u = np.concatenate(l_parts)
        order = np.argsort(ranks_u, kind="stable")
        ranks = ranks_u[order]
        lens = lens_u[order]
        offs = np.concatenate([[0], np.cumsum(lens)])
        offs_u = np.concatenate([[0], np.cumsum(lens_u)])
        values_u = np.concatenate(v_parts) if v_parts else np.empty(0, np.uint64)
        values = np.empty(values_u.size, dtype=np.uint64)
        for j, src in enumerate(order):  # ~1 memcpy per participating doc
            values[offs[j] : offs[j + 1]] = \
                values_u[offs_u[src] : offs_u[src] + lens_u[src]]
    else:
        ranks = np.empty(0, np.int64)
        offs = np.zeros(1, np.int64)
        values = np.empty(0, np.uint64)
    store_ref = ray.put((ranks, offs, values))

    thresh = cfg.jaccard_threshold
    k = cfg.kmv_k

    def score(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ranks_, offs_, values_ = ray.get(store_ref)  # zero-copy plasma views
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ia = np.searchsorted(ranks_, a)
        ib = np.searchsorted(ranks_, b)
        jac = np.empty(a.size, dtype=np.float64)
        for i in range(a.size):
            va = values_[offs_[ia[i]] : offs_[ia[i] + 1]]
            vb = values_[offs_[ib[i]] : offs_[ib[i] + 1]]
            jac[i] = kmv_jaccard(va, vb, k)
        keep = jac >= thresh
        return pa.table({
            "a": pa.array(a[keep]),
            "b": pa.array(b[keep]),
            "kind": pa.array(["near"] * int(keep.sum()), pa.string()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    return cand_ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


def _verify_join(cand_ds, sig_ds, cfg: PipelineConfig, ids):
    sk = sig_ds.select_columns(["rank", "kmv"])
    if ids is not None:
        import ray

        ids_ref = ray.put(ids)

        def filt(t: pa.Table) -> pa.Table:
            import ray as _ray
            t = t.replace_schema_metadata(None)
            sorted_ids = _ray.get(ids_ref)
            r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(sorted_ids, r)
            idx_c = np.minimum(idx, sorted_ids.size - 1)
            return t.filter(pa.array(sorted_ids[idx_c] == r))

        sk = sk.map_batches(filt, batch_format="pyarrow")

    j1 = hash_join(cand_ds, sk, left_on="a", right_on="rank",
                   n_buckets=cfg.join_buckets, suffix="_a")
    # after join 1: columns a,b,n_bands,rank,kmv → rename kmv→kmv_a, drop rank
    def rn1(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({
            "a": t["a"].cast(pa.int64()),
            "b": t["b"].cast(pa.int64()),
            "kmv_a": t["kmv"].cast(pa.binary()),
        })

    # materialize between the two joins: hash_join needs the input schema and
    # the second shuffle would otherwise re-execute the first join's DAG
    j1 = j1.map_batches(rn1, batch_format="pyarrow").materialize()
    j2 = hash_join(j1, sk, left_on="b", right_on="rank",
                   n_buckets=cfg.join_buckets, suffix="_b")

    thresh = cfg.jaccard_threshold
    k = cfg.kmv_k

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": [], "b": [], "kind": [], "jaccard": []})
        jac = np.empty(len(g), dtype=np.float64)
        ka = g["kmv_a"].to_numpy()
        kb = g["kmv"].to_numpy()
        for i in range(len(g)):
            va = np.frombuffer(ka[i] or b"", dtype=np.uint64)
            vb = np.frombuffer(kb[i] or b"", dtype=np.uint64)
            jac[i] = kmv_jaccard(va, vb, k)
        out = pd.DataFrame({
            "a": g["a"].to_numpy(dtype=np.int64),
            "b": g["b"].to_numpy(dtype=np.int64),
            "kind": "near",
            "jaccard": jac,
        })
        return out[out["jaccard"] >= thresh]

    return j2.map_batches(score, batch_format="pandas")

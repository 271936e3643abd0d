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


def verify_candidates(cand_ds, sig_ds, cfg: PipelineConfig):
    """Attach both sides' KMV sketches and keep pairs with J ≥ threshold.

    Returns edges (a, b, kind='near', jaccard:float64).
    """
    sk = sig_ds.select_columns(["rank", "kmv"])

    # semi-join prefilter: only docs that appear in a candidate pair need
    # their KMV sketch shuffled through the joins (typically a small
    # fraction of the corpus). Driver holds just the id array; skipped if
    # the pair set is too large to collect.
    n_pairs = cand_ds.count()
    if 0 < n_pairs <= 5_000_000:
        import ray

        pdf = cand_ds.select_columns(["a", "b"]).to_pandas()
        ids = np.unique(np.concatenate([pdf["a"].to_numpy(dtype=np.int64),
                                        pdf["b"].to_numpy(dtype=np.int64)]))
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

"""Similarity search over embedding columns.

Brute-force cosine top-k as the correctness baseline (blocked numpy matmul
per batch against a broadcast query matrix — ray.put ONCE, read per task),
plus a random-hyperplane LSH-bucketed variant as the scale path (the same
banding shuffle as the text pipeline, reused for vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix."""
    lst = col.to_pylist()
    if not lst:
        return np.empty((0, 0))
    return np.asarray(lst, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(emb_ds, query_ids: np.ndarray, k: int = 5,
                     id_col: str = "vec_id", emb_col: str = "embedding"):
    """Top-k cosine neighbors for the given query vec_ids (excluding self).

    Streaming: per-batch partial top-k against the broadcast query matrix,
    then one small groupby(query_id) merges partials. Never materializes the
    corpus. Ties broken by neighbor_id (deterministic).
    """
    import ray
    from pcompress_ray.functions.ops import semi_join_filter

    qset = set(int(q) for q in query_ids)
    q_tab = semi_join_filter(emb_ds.select_columns([id_col, emb_col]),
                             qset, on=id_col).to_pandas()
    q_tab = q_tab.sort_values(id_col)
    Q = _normalize(np.asarray(q_tab[emb_col].tolist(), dtype=np.float64))
    qids = q_tab[id_col].to_numpy(dtype=np.int64)
    ref = ray.put((qids, Q))

    def partial(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        qids_, Q_ = ray.get(ref)
        M = _normalize(_matrix(t[emb_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        S = Q_ @ M.T  # (nq, nb)
        out_q, out_n, out_c = [], [], []
        kk = min(k + 1, S.shape[1])  # +1: self may be in the batch
        for qi in range(S.shape[0]):
            idx = np.argpartition(-S[qi], kk - 1)[:kk]
            out_q.append(np.full(idx.size, qids_[qi], dtype=np.int64))
            out_n.append(ids[idx])
            out_c.append(S[qi][idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    partials = emb_ds.select_columns([id_col, emb_col]).map_batches(
        partial, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id", "cosine"]]

    return partials.groupby("query_id").map_groups(topk, batch_format="pandas")


def cosine_neardup_pairs(emb_ds, threshold: float,
                         id_col: str = "vec_id", emb_col: str = "embedding",
                         block: int = 4096):
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Blocked all-pairs: the dataset is chunked into row blocks; every block
    pair is compared in its own Ray task (the O(n²/B²) task grid — exact,
    parallel, no driver matrix). For corpora where n is huge, use
    ``lsh_bucketed_pairs`` instead.
    """
    import ray

    rows = emb_ds.select_columns([id_col, emb_col]).to_pandas()
    ids = rows[id_col].to_numpy(dtype=np.int64)
    M = _normalize(np.asarray(rows[emb_col].tolist(), dtype=np.float64))
    nb = (len(ids) + block - 1) // block
    mat_ref = ray.put((ids, M))

    @ray.remote
    def block_pair(bi: int, bj: int):
        ids_, M_ = ray.get(mat_ref)
        si, sj = slice(bi * block, (bi + 1) * block), slice(bj * block, (bj + 1) * block)
        S = M_[si] @ M_[sj].T
        ai, bj_idx = np.nonzero(S >= threshold)
        a = ids_[si][ai]
        b = ids_[sj][bj_idx]
        keep = a < b
        return pa.table({"vec_a": pa.array(a[keep]), "vec_b": pa.array(b[keep]),
                         "cosine": pa.array(S[ai, bj_idx][keep], pa.float64())})

    import ray.data as rd

    refs = [block_pair.remote(i, j) for i in range(nb) for j in range(i, nb)]
    return rd.from_arrow_refs(refs)


class HyperplaneLSH:
    """Actor-pool stage: random-hyperplane signatures → bucket keys.

    State (the projection matrix) is built once per actor — the vector
    analog of the MinHash permutation table (T3).
    """

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 12,
                 seed: int = 7, emb_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        M = _normalize(_matrix(t[self.emb_col]))
        n = M.shape[0]
        weights = (1 << np.arange(self.planes.shape[1], dtype=np.uint64))
        buckets = np.empty((n, self.n_tables), dtype=np.uint64)
        for ti in range(self.n_tables):
            bits = (M @ self.planes[ti].T) > 0  # (n, n_bits)
            buckets[:, ti] = (bits.astype(np.uint64) * weights).sum(axis=1)
        return t.append_column(
            "lsh_buckets", pa.array(list(buckets), pa.list_(pa.uint64())))


def lsh_bucketed_pairs(emb_ds, threshold: float, dim: int,
                       id_col: str = "vec_id", emb_col: str = "embedding",
                       bucket_cap: int = 512):
    """Scale path: candidate pairs from hyperplane-LSH buckets, verified by
    exact cosine inside each bucket group (carries the vector in the group —
    buckets are small by construction; oversized buckets are subsampled)."""
    sig = emb_ds.select_columns([id_col, emb_col]).map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "emb_col": emb_col},
        batch_format="pyarrow", concurrency=(1, 4))

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        n_tab = pc.list_value_length(t["lsh_buckets"]).to_numpy(zero_copy_only=False)
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), n_tab)
        tab_ids = np.concatenate([np.arange(c, dtype=np.int32) for c in n_tab]) \
            if len(n_tab) else np.empty(0, np.int32)
        embs = t[emb_col].to_pylist()
        emb_rep = [e for e, c in zip(embs, n_tab) for _ in range(c)]
        return pa.table({
            "table_id": pa.array(tab_ids),
            "bucket": pc.list_flatten(t["lsh_buckets"]),
            id_col: pa.array(ids.astype(np.int64)),
            emb_col: pa.array(emb_rep, pa.list_(pa.float32())),
        })

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col)
        if len(g) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        if len(g) > bucket_cap:
            g = g.head(bucket_cap)
        ids = g[id_col].to_numpy(dtype=np.int64)
        M = _normalize(np.asarray(g[emb_col].tolist(), dtype=np.float64))
        S = M @ M.T
        ai, bi = np.nonzero(np.triu(S >= threshold, k=1))
        a, b = ids[ai], ids[bi]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cosine": S[ai, bi]})

    from ray.data.aggregate import Max

    pairs = (sig.map_batches(explode, batch_format="pyarrow")
             .groupby(["table_id", "bucket"])
             .map_groups(emit, batch_format="pandas"))
    # dedup across tables
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Max("cosine", alias_name="cosine"))

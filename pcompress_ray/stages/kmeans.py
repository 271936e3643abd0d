"""Distributed Lloyd k-means over an embedding column.

Completes the embedding-operator family (ann.py: brute-force / IVF / PQ /
hyperplane-LSH): those use a SAMPLE-trained quantizer
(ann.py:_train_centroids); this operator runs full-corpus Lloyd iterations
the Ray-Data way —

- init: deterministic rank-invariant seed rows — each block emits its k
  rows with the smallest ``splitmix64(vec_id ^ seed)``, the driver keeps
  the global k smallest (one pass; independent of block order/count),
- each iteration: ONE ``map_batches`` pass; every block emits a fixed-size
  partial (k x dim centroid sums + k counts, float64) against the
  broadcast current centroids; the driver folds #blocks partials (the
  functions/cms.py fixed-size-partial pattern) and recomputes centroids,
- assignment: one final stateless ``map_batches`` argmin pass.

No shuffle at any step — per-iteration exchange volume is
#blocks x k x (dim+1) x 8 bytes regardless of corpus size, which is what
makes this shape hold at 10^9 rows where a groupby(cluster) reduction
would move the full vector payload every iteration.

Empty clusters keep their previous centroid (deterministic; no resample).
Distances are squared-L2 computed as ||x||^2 - 2x.c + ||c||^2 with ties
broken by lowest cluster index (argmin) — pinned exactly by the numpy
reference oracle in tests/test_kmeans.py.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.hashing import splitmix64
from pcompress_ray.stages.ann import _matrix


def _seed_rows(emb_ds, k: int, id_col: str, emb_col: str, seed: int):
    """Global k rows with smallest splitmix64(vec_id ^ seed): per-block
    partial top-k, driver merge — deterministic for any blocking."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        take = np.argsort(h, kind="stable")[:k]
        m = _matrix(t[emb_col])[take]
        return pa.table({
            "h": pa.array(h[take].astype(np.uint64)),
            "vec": pa.array([row.tobytes() for row in
                             m.astype(np.float64)], pa.binary()),
        })

    parts = emb_ds.map_batches(partial, batch_format="pyarrow").take_all()
    hs = np.array([r["h"] for r in parts], dtype=np.uint64)
    order = np.argsort(hs, kind="stable")[:k]
    return np.stack([np.frombuffer(parts[i]["vec"], np.float64)
                     for i in order])


def kmeans_fit(emb_ds, k: int = 8, n_iter: int = 5, id_col: str = "vec_id",
               emb_col: str = "embedding", seed: int = 0) -> np.ndarray:
    """Full-corpus Lloyd; returns (k, dim) float64 centroids."""
    cents = _seed_rows(emb_ds, k, id_col, emb_col, seed)

    for _ in range(n_iter):
        c = cents  # closure-captured broadcast (k x dim, tiny)

        def partial(t: pa.Table) -> pa.Table:
            m = _matrix(t[emb_col]).astype(np.float64)
            d = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) \
                + (c * c).sum(1)[None, :]
            a = np.argmin(d, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.float64)
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([counts.tobytes()], pa.binary()),
            })

        def combine(t: pa.Table) -> pa.Table:
            # combine tier (exact: float64 sums are folded in block order
            # within a batch either way): driver ingress #blocks/64 x
            # k x (dim+1) doubles instead of #blocks — matters at k >= 10^3
            s = np.zeros_like(c)
            n = np.zeros(c.shape[0], np.float64)
            for i in range(len(t)):
                s += np.frombuffer(t["sums"][i].as_py(), np.float64) \
                    .reshape(c.shape)
                n += np.frombuffer(t["counts"][i].as_py(), np.float64)
            return pa.table({
                "sums": pa.array([s.tobytes()], pa.binary()),
                "counts": pa.array([n.tobytes()], pa.binary()),
            })

        parts = emb_ds.map_batches(partial, batch_format="pyarrow") \
            .map_batches(combine, batch_size=64, batch_format="pyarrow") \
            .take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(cents.shape[0], dtype=np.float64)
        for r in parts:  # driver fold: #blocks/64 x k x (dim+1) doubles
            sums += np.frombuffer(r["sums"], np.float64) \
                .reshape(cents.shape)
            counts += np.frombuffer(r["counts"], np.float64)
        nonempty = counts > 0
        new = cents.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
    return cents


def kmeans_assign(emb_ds, centroids: np.ndarray, id_col: str = "vec_id",
                  emb_col: str = "embedding"):
    """(id, cluster) Dataset: one stateless argmin pass."""
    c = centroids

    def assign(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        m = _matrix(t[emb_col]).astype(np.float64)
        d = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) \
            + (c * c).sum(1)[None, :]
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64)),
        })

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_reference(mat: np.ndarray, init: np.ndarray,
                     n_iter: int) -> tuple[np.ndarray, np.ndarray]:
    """Single-machine numpy oracle with IDENTICAL update rules (used by
    tests to pin the distributed implementation exactly)."""
    cents = init.astype(np.float64).copy()
    for _ in range(n_iter):
        d = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ cents.T) \
            + (cents * cents).sum(1)[None, :]
        a = np.argmin(d, axis=1)
        for j in range(cents.shape[0]):
            sel = a == j
            if sel.any():
                cents[j] = mat[sel].mean(0)
    d = (mat * mat).sum(1)[:, None] - 2.0 * (mat @ cents.T) \
        + (cents * cents).sum(1)[None, :]
    return cents, np.argmin(d, axis=1)

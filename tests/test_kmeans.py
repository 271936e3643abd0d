"""Distributed k-means == numpy reference with identical update rules,
and blob recovery on separated clusters."""
import numpy as np
import pandas as pd
import pytest

from pcompress_ray.stages.kmeans import (kmeans_assign, kmeans_fit,
                                         kmeans_reference)


def _blobs(rng, n_per, centers, spread=0.05):
    pts = np.concatenate([c + spread * rng.standard_normal((n_per, len(c)))
                          for c in centers])
    truth = np.repeat(np.arange(len(centers)), n_per)
    return pts.astype(np.float32), truth


def _ds(mat):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [row.tolist() for row in mat],
    })).repartition(6)


def test_matches_reference_and_recovers_blobs(ray_session):
    rng = np.random.default_rng(11)
    centers = np.array([[0, 0, 0], [5, 5, 0], [0, 5, 5], [9, 0, 9]],
                       dtype=np.float64)
    mat, truth = _blobs(rng, 60, centers)
    ds = _ds(mat)
    cents = kmeans_fit(ds, k=4, n_iter=6, seed=8)
    got = (kmeans_assign(ds, cents).to_pandas()
           .sort_values("vec_id")["cluster"].to_numpy())

    # same init path as the engine -> same trajectory as the numpy oracle
    from pcompress_ray.stages.kmeans import _seed_rows

    init = _seed_rows(ds, 4, "vec_id", "embedding", 8)
    ref_c, ref_a = kmeans_reference(mat.astype(np.float64), init, 6)
    assert np.allclose(cents, ref_c, atol=1e-8)
    assert np.array_equal(got, ref_a)
    # blob recovery: each true blob maps to exactly one k-means cluster
    for b in range(4):
        assert len(set(got[truth == b])) == 1
    assert len({got[truth == b][0] for b in range(4)}) == 4


def test_blocking_invariance(ray_session):
    rng = np.random.default_rng(12)
    mat, _ = _blobs(rng, 40, np.eye(4) * 6)
    c1 = kmeans_fit(_ds(mat).repartition(2), k=4, n_iter=4, seed=1)
    c2 = kmeans_fit(_ds(mat).repartition(9), k=4, n_iter=4, seed=1)
    assert np.allclose(c1, c2, atol=1e-8)

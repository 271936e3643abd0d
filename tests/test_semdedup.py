"""SemDeDup == single-machine numpy oracle with identical rules; planted
near-duplicate groups are collapsed to one kept exemplar; blocking-invariant."""
import numpy as np
import pandas as pd
import pytest

from pcompress_ray.stages.kmeans import _seed_rows
from pcompress_ray.stages.semdedup import semdedup, semdedup_reference


def _corpus(rng, n_base=40, dup_per=3, dim=16):
    """n_base well-separated points; the first 8 each get dup_per near-copies
    (cosine > 0.99 to their base)."""
    base = rng.standard_normal((n_base, dim)) * 3.0
    rows, group = [base], [np.arange(n_base)]
    for i in range(8):
        jit = base[i][None, :] * (1.0 + 0.001 * rng.standard_normal(
            (dup_per, 1)))
        rows.append(jit)
        group.append(np.full(dup_per, i))
    mat = np.concatenate(rows).astype(np.float32)
    return mat, np.concatenate(group)


def _ds(mat, parts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(len(mat), dtype=np.int64),
        "embedding": [r.tolist() for r in mat],
    })).repartition(parts)


def _run(mat, parts, eps=0.97, k=4, n_iter=4, seed=5):
    got = (semdedup(_ds(mat, parts), k=k, eps=eps, n_iter=n_iter, seed=seed)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return got


def test_matches_reference_and_collapses_planted_dups(ray_session):
    rng = np.random.default_rng(21)
    mat, group = _corpus(rng)
    ids = np.arange(len(mat), dtype=np.int64)
    got = _run(mat, parts=6)

    init = _seed_rows(_ds(mat, 6), 4, "vec_id", "embedding", 5)
    asg, keep, dup_of = semdedup_reference(ids, mat.astype(np.float64),
                                           init, eps=0.97, n_iter=4)
    assert np.array_equal(got["cluster"].to_numpy(), asg)
    assert np.array_equal(got["keep"].to_numpy(), keep.astype(np.int64))
    assert np.array_equal(got["dup_of"].to_numpy(), dup_of)

    # every planted near-dup group keeps exactly one member
    for g in range(8):
        members = np.flatnonzero(group == g)
        assert got.loc[members, "keep"].sum() == 1
    # kept rows have dup_of == -1; dropped rows point at a kept vec_id
    kept_ids = set(got.loc[got["keep"] == 1, "vec_id"])
    dropped = got[got["keep"] == 0]
    assert (got.loc[got["keep"] == 1, "dup_of"] == -1).all()
    assert dropped["dup_of"].isin(kept_ids).all()


def test_blocking_invariance(ray_session):
    rng = np.random.default_rng(22)
    mat, _ = _corpus(rng, n_base=30, dup_per=2)
    a = _run(mat, parts=2)
    b = _run(mat, parts=9)
    pd.testing.assert_frame_equal(a, b)


def test_eps_one_keeps_everything(ray_session):
    rng = np.random.default_rng(23)
    mat, _ = _corpus(rng, n_base=20, dup_per=0)
    got = _run(mat, parts=3, eps=1.01)
    assert (got["keep"] == 1).all()
    assert (got["dup_of"] == -1).all()

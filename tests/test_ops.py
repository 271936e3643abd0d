"""Unit tests for the generic distributed operators (functions/ops.py) and
connected components."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pcompress_ray.stages.components import assign_clusters, union_find


def test_union_find_basic():
    a = np.array([1, 2, 10, 11])
    b = np.array([2, 3, 11, 12])
    labels = union_find(a, b)
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[12] == 10


def test_union_find_chain_transitivity():
    n = 1000
    a = np.arange(n - 1)
    b = np.arange(1, n)
    labels = union_find(a, b)
    assert all(labels[i] == 0 for i in range(n))


def test_assign_clusters_singletons():
    df = assign_clusters(np.array([5, 6, 7]), {6: 5, 5: 5})
    assert df[df.doc_rank == 7].cluster_id.iloc[0] == 7
    assert df[df.doc_rank == 7].is_canonical.iloc[0]
    assert df[df.doc_rank == 6].cluster_id.iloc[0] == 5


@pytest.fixture()
def rds(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    return rd


def test_hash_join_matches_pandas(rds):
    from pcompress_ray.functions.ops import hash_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 50, 200), "x": np.arange(200)})
    right = pd.DataFrame({"kk": np.arange(50), "y": rng.random(50)})
    lds = rds.from_pandas(left).repartition(4)
    rds_ = rds.from_pandas(right).repartition(3)
    got = hash_join(lds, rds_, "k", "kk", n_buckets=8).to_pandas()
    got = got.sort_values(["x"]).reset_index(drop=True)
    want = left.merge(right, left_on="k", right_on="kk").sort_values("x").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["x"].astype(int).to_numpy() == want["x"].to_numpy()).all()
    np.testing.assert_allclose(got["y"].to_numpy(), want["y"].to_numpy())


def test_bloom_filter_no_false_negatives():
    from pcompress_ray.functions.bloom import BloomFilter

    rng = np.random.default_rng(17)
    keys = rng.integers(0, 2**62, 50_000, dtype=np.int64)
    bf = BloomFilter.build(keys, bits_per_key=10)
    assert bf.contains(keys).all()  # NEVER a false negative
    probe = rng.integers(0, 2**62, 100_000, dtype=np.int64)
    novel = probe[~np.isin(probe, keys)]
    fp = bf.contains(novel).mean()
    assert fp < 0.03, fp  # ~1% expected at 10 bits/key


def test_semi_join_exact_and_bloom(rds):
    import pytest

    from pcompress_ray.functions.ops import semi_join_filter

    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                       "v": np.arange(1000)})
    ds = rds.from_pandas(df).repartition(3)
    keys = np.arange(0, 1000, 7, dtype=np.int64)
    got = semi_join_filter(ds, keys, on="k").to_pandas()
    assert sorted(got.k) == sorted(keys.tolist())
    anti = semi_join_filter(ds, keys, on="k", negate=True).to_pandas()
    assert len(anti) == 1000 - len(keys)
    # Bloom prefilter: superset of the exact result, no true match dropped
    approx = semi_join_filter(ds, keys, on="k", approx=True).to_pandas()
    assert set(keys.tolist()) <= set(approx.k.astype(int))
    with pytest.raises(ValueError):
        semi_join_filter(ds, keys, on="k", negate=True, approx=True)


def test_hash_join_left_outer(rds):
    from pcompress_ray.functions.ops import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "y": [99]})
    got = hash_join(rds.from_pandas(left), rds.from_pandas(right),
                    "k", "k", n_buckets=2, how="left").to_pandas()
    assert len(got) == 3
    assert got.loc[got.x == 20, "y"].iloc[0] == 99
    assert got.loc[got.x == 10, "y"].isna().all()


def test_broadcast_join(rds, ray_session):
    from pcompress_ray.functions.ops import broadcast_join

    big = pd.DataFrame({"k": np.arange(100) % 10, "x": np.arange(100)})
    small = pd.DataFrame({"k": np.arange(10), "name": [f"n{i}" for i in range(10)]})
    got = broadcast_join(rds.from_pandas(big).repartition(4), small, "k", "k").to_pandas()
    assert len(got) == 100
    assert (got.sort_values("x").name.to_numpy()[:10] ==
            [f"n{i % 10}" for i in range(10)]).all()


def test_zip_with_rank(rds):
    from pcompress_ray.functions.ops import zip_with_rank

    df = pd.DataFrame({"u": [f"u{i:03d}" for i in np.random.default_rng(4).permutation(40)]})
    ds = rds.from_pandas(df).repartition(5)
    out = zip_with_rank(ds, "u").to_pandas().sort_values("u").reset_index(drop=True)
    assert (out["rank"].to_numpy() == np.arange(40)).all()


def test_label_propagation_matches_union_find(rds):
    from pcompress_ray.stages.components import label_propagation

    rng = np.random.default_rng(5)
    a = rng.integers(0, 80, 120).astype(np.int64)
    b = rng.integers(0, 80, 120).astype(np.int64)
    edges = rds.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(4)
    got = label_propagation(edges).to_pandas().set_index("node")["label"].to_dict()
    want = union_find(a, b)
    assert got == {k: v for k, v in want.items()}

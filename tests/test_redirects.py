"""Pointer-doubling chain resolution: known chains, branching trees,
cycle detection, dangling pointers, parallelism invariance
(stages/redirects.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _resolve(node, ptr, parts=4, **kw):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.redirects import resolve_pointers

    ds = rd.from_arrow(pa.table({
        "node": pa.array(np.asarray(node, np.int64)),
        "ptr": pa.array(np.asarray(ptr, np.int64))})).repartition(parts)
    out = resolve_pointers(ds, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_single_chain(ray_session):
    # 0 <- 1 <- 2 <- ... <- 9 : everything resolves to 0 with hop = id
    node = list(range(10))
    ptr = [0] + list(range(9))
    out = _resolve(node, ptr)
    assert (out["final_id"] == 0).all()
    assert list(out["hops"]) == list(range(10))


def test_tree_and_multiple_roots(ray_session):
    # two trees: root 0 with children 1,2 (2's child 3); root 10 alone
    node = [0, 1, 2, 3, 10]
    ptr = [0, 0, 0, 2, 10]
    out = _resolve(node, ptr)
    assert list(out["final_id"]) == [0, 0, 0, 0, 10]
    assert list(out["hops"]) == [0, 1, 1, 2, 0]


def test_long_chain_log_rounds(ray_session):
    # 1000-node chain resolves within max_rounds=12 (2^10 > 1000 after
    # the first squaring round) — the doubling, not linear, behavior
    n = 1000
    node = np.arange(n)
    ptr = np.maximum(node - 1, 0)
    out = _resolve(node, ptr, parts=7, max_rounds=12)
    assert (out["final_id"] == 0).all()
    assert (out["hops"].to_numpy() == node).all()


def test_cycle_raises(ray_session):
    with pytest.raises(Exception, match="cycle|fixpoint"):
        _resolve([0, 1], [1, 0], max_rounds=8)


def test_dangling_pointer_raises(ray_session):
    with pytest.raises(Exception, match="dangling|missing"):
        _resolve([0, 1], [0, 5])


def test_parallelism_invariance(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    node = np.arange(n)
    # random forest: each node points to a smaller id (or itself for %17)
    ptr = np.where(node % 17 == 0, node,
                   rng.integers(0, np.maximum(node, 1)))
    outs = [_resolve(node, ptr, parts=p) for p in (1, 6)]
    # roots of the forest are the %17 nodes reached transitively
    assert outs[0].equals(outs[1])
    assert (outs[0]["final_id"].to_numpy() % 17 == 0).all()


def test_random_forest_vs_python_walk(ray_session):
    """Random functional forests: final target AND hop count match a
    pure-Python chain walk exactly."""
    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 200
        node = np.arange(n)
        ptr = np.where(node % 11 == 0, node,
                       rng.integers(0, np.maximum(node, 1)))
        out = _resolve(node, ptr, parts=5)
        p = dict(zip(node.tolist(), ptr.tolist()))
        for i in range(n):
            j, h = i, 0
            while p[j] != j:
                j = p[j]
                h += 1
            assert out["final_id"].iloc[i] == j, (trial, i)
            assert out["hops"].iloc[i] == h, (trial, i)

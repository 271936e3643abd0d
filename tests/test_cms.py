"""Count-Min sketch oracle tests (A5 sketch-family sibling of the KMV
tests): one-sided error, εN overshoot bound, merge associativity, and the
distributed heavy-hitters query recovering the exact top set on skewed
data."""

from __future__ import annotations

import numpy as np
import pytest

from pcompress_ray.functions.cms import CountMinSketch, heavy_hitters
from pcompress_ray.hashing import hash_strings


def _zipf_stream(n=20000, vocab=500, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, n).astype(np.uint64) % vocab
    return keys


def test_estimate_never_undercounts_and_eps_bound():
    keys = _zipf_stream()
    sk = CountMinSketch.empty(w=2048, d=4).add(keys)
    uniq, true = np.unique(keys, return_counts=True)
    est = sk.estimate(uniq)
    assert np.all(est >= true)  # one-sided guarantee
    # overshoot ≤ εN with ε = e/w, here far under the bound on zipf data
    eps_n = np.e / 2048 * keys.size
    assert np.all(est - true <= 2 * eps_n)


def test_merge_equals_single_pass():
    keys = _zipf_stream()
    whole = CountMinSketch.empty().add(keys)
    half = (CountMinSketch.empty().add(keys[: keys.size // 2])
            .merge(CountMinSketch.empty().add(keys[keys.size // 2 :])))
    assert np.array_equal(whole.table, half.table)
    # merge order irrelevant (associative + commutative)
    thirds = np.array_split(keys, 3)
    a = CountMinSketch.empty().add(thirds[0])
    b = CountMinSketch.empty().add(thirds[1])
    c = CountMinSketch.empty().add(thirds[2])
    assert np.array_equal(a.merge(b).merge(c).table,
                          c.merge(a.merge(b)).table)


def test_geometry_mismatch_rejected():
    with pytest.raises(ValueError):
        CountMinSketch.empty(w=1024).merge(CountMinSketch.empty(w=2048))


def test_heavy_hitters_recover_exact_top():
    keys = _zipf_stream()
    sk = CountMinSketch.empty().add(keys)
    uniq, true = np.unique(keys, return_counts=True)
    top_true = set(uniq[np.argsort(-true)[:10]].tolist())
    hh_keys, hh_est = heavy_hitters(sk, uniq, 10)
    # zipf head is well separated → estimated top-10 == exact top-10
    assert set(hh_keys.tolist()) == top_true
    assert np.all(np.diff(hh_est) <= 0)


def test_cms_query_matches_exact_counts(ray_session):
    """The distributed query's estimates on sf0.001: every est ≥ exact,
    and the top-20 SET equals the exact top-20 (counts well separated)."""
    import duckdb

    import pcompress_ray

    pcompress_ray.register_for_ray()
    import __ray_entry__ as e

    out = e.queries()["cms_top_tokens"]("/root/testdata/sf0.001")
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    exact = duckdb.sql("""
        SELECT t AS token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(list_filter(
                  string_split(coalesce(text, ''), ' '), x -> x <> '')) AS t
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
        GROUP BY t ORDER BY n DESC, token LIMIT 20
    """).df()
    assert len(out) == 20
    assert set(out["token"]) == set(exact["token"])
    truth = dict(zip(exact["token"], exact["n"]))
    for tok, est in zip(out["token"], out["est_n"]):
        assert est >= truth[tok]

"""skew_report oracle: the sort+reduceat per-bucket statistics equal a
plain pandas groupby reference, including the smallest-key-among-hottest
tie-break."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_skew_report_matches_pandas_reference():
    import ray.data as rd

    from pcompress_ray.functions.ops import skew_report

    rng = np.random.default_rng(9)
    # zipf-ish keys so buckets are genuinely skewed; force an exact tie
    keys = np.concatenate([
        rng.zipf(1.5, 5000).astype(np.int64) % 997,
        np.full(20, 64 + 7, np.int64),     # bucket 7: key 71 ×20
        np.full(20, 128 + 7, np.int64),    # bucket 7: key 135 ×20 (tie)
    ])
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys)})).repartition(5)
    out = skew_report(ds, "user_id", n_buckets=16, n_parts=4).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)

    df = pd.DataFrame({"key": keys, "bucket": keys % 16})
    per_key = df.groupby(["bucket", "key"]).size().reset_index(name="c")
    exp = []
    for bkt, g in per_key.groupby("bucket"):
        mx = g["c"].max()
        exp.append({
            "bucket": bkt,
            "n_rows": int(g["c"].sum()),
            "n_keys": len(g),
            "max_key_rows": int(mx),
            "top_key": int(g.loc[g["c"] == mx, "key"].min()),
        })
    exp = pd.DataFrame(exp).sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype(np.int64), exp.astype(np.int64), check_like=True)


def test_skew_report_single_bucket_and_key():
    import ray.data as rd

    from pcompress_ray.functions.ops import skew_report

    ds = rd.from_arrow(pa.table({"k": pa.array([5, 5, 5], pa.int64())}))
    out = skew_report(ds, "k", n_buckets=4, n_parts=2).to_pandas()
    assert out.to_dict("records") == [
        {"bucket": 1, "n_rows": 3, "n_keys": 1,
         "max_key_rows": 3, "top_key": 5}]

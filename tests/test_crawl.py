"""crawl_schedule invariants: per-host FIFO, per-round host cap, schedule
is a pure function of the input (parallelism-invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _run(hosts, ids, per_round=2, nblocks=3, n_parts=4):
    import ray.data as rd

    from pcompress_ray.stages.crawl import crawl_schedule

    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "host": pa.array(hosts, pa.string())})
    ds = rd.from_arrow(t).repartition(nblocks)
    return crawl_schedule(ds, per_round=per_round, n_parts=n_parts) \
        .to_pandas().sort_values(["host", "doc_id"]).reset_index(drop=True)


def test_cap_and_fifo_and_invariance():
    rng = np.random.default_rng(13)
    hosts = [f"h{int(x)}" for x in rng.integers(0, 5, 60)]
    ids = list(rng.permutation(60))
    out = _run(hosts, ids, per_round=2)

    # per (host, round): at most per_round rows, slots exactly 0..m-1
    for (_, _), g in out.groupby(["host", "fetch_round"]):
        assert len(g) <= 2
        assert sorted(g["slot"]) == list(range(len(g)))
    # FIFO: within host, (round, slot) increases with doc_id
    for _, g in out.groupby("host"):
        key = (g["fetch_round"] * 2 + g["slot"]).to_numpy()
        assert (np.diff(key) == 1).all()
        assert key[0] == 0
    # invariance: different block/partition counts -> identical schedule
    out2 = _run(hosts, ids, per_round=2, nblocks=7, n_parts=2)
    pd.testing.assert_frame_equal(out, out2)

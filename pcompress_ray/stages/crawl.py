"""Crawl-frontier politeness scheduling.

A fetch frontier must bound per-host concurrency (robots politeness /
crawl-delay): at most ``per_round`` URLs of any host are fetched in the
same round. The deterministic assignment — per-host FIFO rank r by a
stable order column, fetch_round = r // per_round, slot = r % per_round —
is a pure function of the input, so two cluster sizes produce identical
schedules (the same parallelism-invariance bar the dedup pipeline meets).

Shape: ONE host-keyed hash-partitioned exchange; the per-partition rank is
a sort + run-boundary subtraction (no per-host Python). Output size ==
input size; at 10^12 URLs the schedule streams straight back out to
partitioned Parquet, one file per fetch_round range if desired.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def crawl_schedule(ds, host_col: str = "host", order_col: str = "doc_id",
                   per_round: int = 4, n_parts: int = 32):
    """Dataset with (host, order) -> adds (fetch_round, slot) per row."""
    from pcompress_ray.functions.ops import grouped_partitions

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            out = part.copy()
            out["fetch_round"] = pd.Series([], dtype=np.int64)
            out["slot"] = pd.Series([], dtype=np.int64)
            return out
        part = part.sort_values([host_col, order_col],
                                kind="stable").reset_index(drop=True)
        h = part[host_col].to_numpy()
        first = np.empty(len(part), bool)
        first[0] = True
        first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(part)))
        rank = np.arange(len(part), dtype=np.int64) - np.repeat(starts, sizes)
        part["fetch_round"] = rank // per_round
        part["slot"] = rank % per_round
        return part

    return grouped_partitions(ds, [host_col], assign, n_parts=n_parts)

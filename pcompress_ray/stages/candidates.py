"""LSH candidate generation with hot-bucket salting and pair caps.

The analog of the reference's similarity-index probe (J2): each segment's
~20 K-min values are looked up in a shared hashtable and hits become
candidate segments (rabin/rabin_dedup.c:1020-1036). Here the shared index is
replaced by a shuffle: explode per-doc band hashes to (band_id, band_hash,
rank) rows and groupby the bucket key — docs agreeing on any band land in
the same group.

Skew handling (SURVEY §4 "Skew" — explicit design):
- groups of size ≤ bucket_cap emit ALL pairs (pair-level recall),
- larger groups are SALTED: members are split deterministically by
  splitmix64(rank) into sub-buckets of ≤ bucket_cap; each sub-bucket emits
  all pairs, and every sub-bucket representative links to the global
  min-rank member. Connectivity (cluster recall) is preserved through
  transitivity; pair count stays linear in group size.
- a hard ``max_pairs_per_bucket`` cap bounds the worst case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.config import PipelineConfig
from pcompress_ray.hashing import splitmix64


def explode_bands(sig_ds):
    """(band_id, band_hash, rank) rows from the per-doc band-hash lists.

    Docs with empty shingle sets (empty text) are excluded — their all-MAX
    sentinel signature would otherwise form a giant fake bucket; empty docs
    are handled by the doc-exact layer.
    """

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        mask = pc.greater(t["n_shingles"], 0)
        t = t.filter(mask)
        ranks = t["rank"].to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(t["band_hashes"]) \
                   .fill_null(0).to_numpy(zero_copy_only=False)
        if counts.size == 0:
            band_ids = np.empty(0, np.int32)
        elif (counts == counts[0]).all():
            band_ids = np.tile(np.arange(counts[0], dtype=np.int32), len(counts))
        else:
            band_ids = np.concatenate(
                [np.arange(c, dtype=np.int32) for c in counts])
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pc.list_flatten(t["band_hashes"]),
            "rank": pa.array(np.repeat(ranks, counts), pa.int64()),
        })

    return sig_ds.select_columns(["rank", "band_hashes", "n_shingles"]) \
                 .map_batches(explode, batch_format="pyarrow")


def _pairs_within(ranks: np.ndarray, cap_pairs: int):
    """All unordered pairs of a (sorted) rank array, capped."""
    m = ranks.size
    n_pairs = m * (m - 1) // 2
    a_idx, b_idx = np.triu_indices(m, k=1)
    if n_pairs > cap_pairs:
        a_idx, b_idx = a_idx[:cap_pairs], b_idx[:cap_pairs]
    return ranks[a_idx], ranks[b_idx]


def band_group_pairs(cfg: PipelineConfig):
    """map_groups fn for groupby(band_id, band_hash) → candidate (a,b) rows."""

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        r = np.unique(g["rank"].to_numpy(dtype=np.int64))
        if r.size < 2:
            return pd.DataFrame({"a": [], "b": []})
        if r.size <= cfg.bucket_cap:
            a, b = _pairs_within(r, cfg.max_pairs_per_bucket)
        else:
            # salt: deterministic sub-buckets of ~bucket_cap members
            n_sub = int(np.ceil(r.size / cfg.bucket_cap))
            sub = (splitmix64(r.astype(np.uint64)) % np.uint64(n_sub)).astype(np.int64)
            parts_a, parts_b = [], []
            reps = []
            for s in range(n_sub):
                rs = r[sub == s]
                if rs.size == 0:
                    continue
                reps.append(rs[0])
                if rs.size >= 2:
                    aa, bb = _pairs_within(rs, cfg.max_pairs_per_bucket)
                    parts_a.append(aa); parts_b.append(bb)
            reps = np.asarray(reps, dtype=np.int64)
            gmin = r[0]
            link_b = reps[reps != gmin]
            parts_a.append(np.full(link_b.size, gmin, dtype=np.int64))
            parts_b.append(link_b)
            a = np.concatenate(parts_a) if parts_a else np.empty(0, np.int64)
            b = np.concatenate(parts_b) if parts_b else np.empty(0, np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo.astype(np.int64), "b": hi.astype(np.int64)})

    return emit


def lsh_candidates(sig_ds, cfg: PipelineConfig):
    """Candidate (a,b) pairs, deduplicated across bands."""
    from ray.data.aggregate import Count

    pairs = (explode_bands(sig_ds)
             .groupby(["band_id", "band_hash"])
             .map_groups(band_group_pairs(cfg), batch_format="pandas"))
    # dedup across bands (a pair can collide in up to lsh_bands bands)
    return (pairs.groupby(["a", "b"])
            .aggregate(Count(alias_name="n_bands"))
            .select_columns(["a", "b", "n_bands"]))

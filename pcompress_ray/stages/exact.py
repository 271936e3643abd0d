"""Exact duplicate detection: document identity + chunk identity (substring).

Reimplements the reference's global exact dedup (J1/A1: key = (SHA-256,
length), first occurrence kept, later ones become backward refs —
rabin/rabin_dedup.c:830-873, index lookup rabin/global/index.c:511-520) as
hash-partition shuffles. "First" is redefined from stream offset to the
explicit ordering column ``rank`` (url order), which makes output
parallelism-invariant (SURVEY §2.9) and removes the reference's serialized
index (T5) and its RAM-bounded eviction (index.c:539-547) — the shuffle is
exact at any scale.

Two layers:
- doc-level: groupby(text_sha256) → star edges to the min-rank member.
- chunk-level: explode (chunk_hash, rank, chunk_len) → groupby(chunk_hash)
  → star edges with shared-byte accounting → groupby(a,b) sum → filter by
  ``substring_min_bytes``. This is what catches long exact spans embedded in
  otherwise-unique documents (pcompress's identity-chunk dedup; the
  suffix-array stage then verifies/extends spans).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.config import PipelineConfig


def add_text_sha(batch: pa.Table, text_col: str = "text_norm") -> pa.Table:
    """Append text_sha256 (hex) of the normalized text — doc identity key."""
    batch = batch.replace_schema_metadata(None)
    texts = batch[text_col].to_pylist()
    shas = [hashlib.sha256((t or "").encode("utf-8", "surrogatepass")).hexdigest()
            for t in texts]
    return batch.append_column("text_sha256", pa.array(shas, pa.string()))


def doc_exact_edges(sig_ds):
    """Edges (a,b,kind='exact',jaccard=1.0) for identical normalized text.

    Star topology to the min-rank member — the backward-ref analog; a group
    of m identical docs emits m-1 edges (linear, skew-safe even for the
    mega-group of empty documents).
    """

    def star(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "kind": [], "jaccard": []})
        r = np.sort(g["rank"].to_numpy())
        return pd.DataFrame({
            "a": np.full(r.size - 1, r[0], dtype=np.int64),
            "b": r[1:].astype(np.int64),
            "kind": "exact",
            "jaccard": 1.0,
        })

    return (sig_ds.select_columns(["text_sha256", "rank"])
            .groupby("text_sha256")
            .map_groups(star, batch_format="pandas"))


def explode_chunks(sig_ds):
    """(rank, chunk_hash, chunk_len) rows from the per-doc chunk lists."""

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.replace_schema_metadata(None)
        ranks = t["rank"].to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(t["chunk_hashes"]) \
                   .fill_null(0).to_numpy(zero_copy_only=False)
        return pa.table({
            "rank": pa.array(np.repeat(ranks, counts), pa.int64()),
            "chunk_hash": pc.list_flatten(t["chunk_hashes"]),
            "chunk_len": pc.list_flatten(t["chunk_lengths"]),
        })

    return sig_ds.select_columns(["rank", "chunk_hashes", "chunk_lengths"]) \
                 .map_batches(explode, batch_format="pyarrow")


def chunk_exact_edges(sig_ds, cfg: PipelineConfig):
    """Substring-duplicate edges from shared CDC chunks.

    explode → groupby(chunk_hash) star pairs (dedup per group first: a doc
    repeating a chunk internally — J3's in-segment self-dedup analog — counts
    once) → groupby(a,b) sum shared bytes → filter ≥ substring_min_bytes.
    Only multi-chunk docs participate: a single-chunk doc identical to part
    of another is still caught because its whole text IS one chunk.
    """
    from ray.data.aggregate import Count, Sum

    chunks = explode_chunks(sig_ds)

    group_cap = cfg.bucket_cap

    def pairs_bytes(g: pd.DataFrame) -> pd.DataFrame:
        # one row per (rank) — shared bytes counted once per doc per chunk-hash
        g = g.sort_values("rank").drop_duplicates("rank")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "shared": []})
        r = g["rank"].to_numpy(dtype=np.int64)
        ln = int(g["chunk_len"].iloc[0])
        if r.size <= group_cap:
            ai, bi = np.triu_indices(r.size, k=1)  # all pairs (pair-level recall)
            a, b = r[ai], r[bi]
        else:
            # mega-group (e.g. a boilerplate chunk): star to min — linear,
            # connectivity preserved transitively (skew guard, SURVEY §4)
            a, b = np.full(r.size - 1, r[0], dtype=np.int64), r[1:]
        return pd.DataFrame({
            "a": a, "b": b,
            "shared": np.full(a.size, ln, dtype=np.int64),
        })

    pair_bytes = (chunks.groupby("chunk_hash")
                  .map_groups(pairs_bytes, batch_format="pandas")
                  .groupby(["a", "b"])
                  .aggregate(Sum("shared", alias_name="shared_bytes"),
                             Count(alias_name="shared_chunks")))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        import pyarrow.compute as pc
        keep = pc.and_(
            pc.greater_equal(t["shared_bytes"], cfg.substring_min_bytes),
            pc.greater_equal(t["shared_chunks"], cfg.substring_min_chunks))
        t = t.filter(keep)
        return pa.table({
            "a": t["a"], "b": t["b"],
            "kind": pa.array(["substring"] * len(t), pa.string()),
            "jaccard": pa.array([0.0] * len(t), pa.float64()),
            "shared_bytes": t["shared_bytes"],
        })

    return pair_bytes.map_batches(finalize, batch_format="pyarrow")

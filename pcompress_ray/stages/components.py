"""Connected components over verified duplicate edges.

The reference resolves duplicates as backward references to the first
occurrence in stream order (rabin/rabin_dedup.c:830-873; ordering enforced by
the semaphore ring, pcompress.c:2617-2624). Re-expressed set-theoretically:
duplicate edges form a graph and the cluster representative ("canonical",
the analog of the backward-ref target) is the member with the minimum
ordering key. Order is defined by a COLUMN (url rank / doc_id), not arrival,
which is what makes output independent of parallelism (SURVEY §2.9).

Two implementations:
- ``min_label_components``: driver-side, fully vectorized numpy min-label
  relaxation with pointer jumping — O((E+V) · log diameter) array passes,
  no Python per-edge loop. Used when the edge set fits the driver
  (cfg.cc_driver_edge_limit; edges ≪ docs for dedup workloads).
- ``label_propagation``: distributed fixpoint of min-label broadcast via
  hash-partitioned, partition-VECTORIZED rounds (grouped_partitions — one
  pandas/numpy call per partition, never per key) — the scale path for
  adversarially huge edge sets. Converges in O(component diameter) rounds;
  dup clusters are near-cliques (star pairs to bucket representatives) so
  diameter is tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SENT = np.iinfo(np.int64).max


class DisjointSet:
    """Array-backed union-find with path halving + union by size."""

    def __init__(self):
        self.parent: dict = {}
        self.size: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        return ra


def union_find(edges_a: np.ndarray, edges_b: np.ndarray) -> dict:
    """Components of an edge list → {node: min_node_in_component}.

    Python-loop reference implementation (kept as the test oracle);
    production paths use ``min_label_components``.
    """
    ds = DisjointSet()
    for a, b in zip(edges_a.tolist(), edges_b.tolist()):
        ds.union(a, b)
    root_min: dict = {}
    for x in ds.parent:
        r = ds.find(x)
        m = root_min.get(r)
        if m is None or x < m:
            root_min[r] = x
    return {x: root_min[ds.find(x)] for x in ds.parent}


def min_label_components(edges_a: np.ndarray, edges_b: np.ndarray):
    """Vectorized components: → (sorted_nodes:int64, labels:int64).

    Min-label relaxation over the edge list plus pointer jumping
    (label ← label-of-label), iterated to fixpoint — every pass is whole-
    array numpy; no Python per-edge work. Label = min node id reachable,
    i.e. the canonical (backward-ref) representative.
    """
    a = np.asarray(edges_a, dtype=np.int64)
    b = np.asarray(edges_b, dtype=np.int64)
    if a.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: a.size], inv[a.size :]
    lab = np.arange(nodes.size, dtype=np.int64)  # label as node INDEX
    while True:
        prev = lab.copy()
        # edge relaxation: both endpoints take the pair minimum
        m = np.minimum(lab[ia], lab[ib])
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        # pointer jumping (path compression): label of my label
        lab = lab[lab]
        lab = lab[lab]
        if np.array_equal(lab, prev):
            break
    return nodes, nodes[lab]


def labels_to_lookup(labels_map: dict):
    """{node: label} dict → (sorted_keys, values) arrays for searchsorted."""
    if not labels_map:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keys = np.fromiter(labels_map.keys(), dtype=np.int64, count=len(labels_map))
    vals = np.fromiter(labels_map.values(), dtype=np.int64, count=len(labels_map))
    order = np.argsort(keys)
    return keys[order], vals[order]


def lookup_labels(keys: np.ndarray, vals: np.ndarray,
                  ids: np.ndarray) -> np.ndarray:
    """Vectorized {keys→vals} lookup with identity default (searchsorted)."""
    ids = np.asarray(ids, dtype=np.int64)
    if keys.size == 0:
        return ids.copy()
    idx = np.minimum(np.searchsorted(keys, ids), keys.size - 1)
    hit = keys[idx] == ids
    return np.where(hit, vals[idx], ids)


def assign_clusters(n_or_ids, labels_map: dict) -> pd.DataFrame:
    """Full cluster table over all node ids: singletons keep their own id."""
    ids = np.asarray(n_or_ids, dtype=np.int64)
    keys, vals = labels_to_lookup(labels_map)
    cluster = lookup_labels(keys, vals, ids)
    return pd.DataFrame({"doc_rank": ids, "cluster_id": cluster,
                         "is_canonical": ids == cluster})


def _min_per_node(ds):
    """Dataset(node,label,...) → one (node, min label) row per node,
    partition-vectorized."""
    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions

    def mn(part: pd.DataFrame) -> pd.DataFrame:
        node = part["node"].to_numpy(dtype=np.int64)
        label = part["label"].to_numpy(dtype=np.int64)
        order = np.lexsort((label, node))
        node, label = node[order], label[order]
        first, _, _ = group_boundaries(node)
        return pd.DataFrame({"node": node[first], "label": label[first]})

    return grouped_partitions(ds.select_columns(["node", "label"]),
                              ["node"], mn)


def label_propagation(edges_ds, max_rounds: int = 50):
    """Distributed min-label propagation over an edges Dataset (cols a,b int64).

    Returns a Dataset (node:int64, label:int64) for every node that appears
    in an edge. Each round: co-partition current labels with edge messages by
    node (grouped_partitions — vectorized per PARTITION, never per key),
    compute each node's current min label, send it to every neighbor, then
    reduce min per node. Stops when the label sum stops decreasing (one
    scalar aggregate per round is the only driver-side value).

    Shuffle cost per round: O(E). Edges are pre-deduplicated; hot nodes are
    fine because the per-partition reduction is linear in partition size.
    """
    from pcompress_ray.functions.ops import group_boundaries, grouped_partitions

    def seed_batch(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.minimum(a, b)
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "label": pa.array(np.concatenate([m, m]))})

    def edge_msgs(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = a.size + b.size
        return pa.table({
            "node": pa.array(np.concatenate([a, b])),
            "other": pa.array(np.concatenate([b, a])),
            "label": pa.array(np.full(n, _SENT, dtype=np.int64)),
        })

    def tag_labels(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        n = len(t)
        return pa.table({
            "node": t["node"].cast(pa.int64()),
            "other": pa.array(np.full(n, -1, dtype=np.int64)),
            "label": t["label"].cast(pa.int64()),
        })

    def propagate(part: pd.DataFrame) -> pd.DataFrame:
        node = part["node"].to_numpy(dtype=np.int64)
        other = part["other"].to_numpy(dtype=np.int64)
        label = part["label"].to_numpy(dtype=np.int64)
        order = np.lexsort((label, node))
        node, other, label = node[order], other[order], label[order]
        first, gid, _ = group_boundaries(node)
        cur = label[first][gid]          # min label of each row's node group
        cur = np.where(cur == _SENT, node, cur)  # node with no label row yet
        is_msg = other >= 0
        return pd.DataFrame({
            "node": np.concatenate([node[first], other[is_msg]]),
            "label": np.concatenate([cur[first], cur[is_msg]]),
        })

    labels = _min_per_node(
        edges_ds.map_batches(seed_batch, batch_format="pyarrow")).materialize()
    old_sum = labels.sum("label")
    msgs = edges_ds.map_batches(edge_msgs, batch_format="pyarrow")

    for _ in range(max_rounds):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow") \
                       .union(msgs)
        new_labels = _min_per_node(
            grouped_partitions(tagged, ["node"], propagate)).materialize()
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == old_sum:
            break
        old_sum = new_sum
    return labels


def components_from_edges(edges_df: pd.DataFrame, all_ranks: np.ndarray,
                          use_driver: bool = True) -> pd.DataFrame:
    """Cluster table (doc_rank, cluster_id, is_canonical) from an edge frame."""
    if len(edges_df) == 0:
        return assign_clusters(all_ranks, {})
    labels = union_find(edges_df["a"].to_numpy(), edges_df["b"].to_numpy())
    return assign_clusters(all_ranks, labels)

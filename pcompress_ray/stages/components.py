"""Connected components over verified duplicate edges.

The reference resolves duplicates as backward references to the first
occurrence in stream order (rabin/rabin_dedup.c:830-873; ordering enforced by
the semaphore ring, pcompress.c:2617-2624). Re-expressed set-theoretically:
duplicate edges form a graph and the cluster representative ("canonical",
the analog of the backward-ref target) is the member with the minimum
ordering key. Order is defined by a COLUMN (url rank / doc_id), not arrival,
which is what makes output independent of parallelism (SURVEY §2.9).

Two implementations:
- ``union_find``: driver-side, O(E α(E)) — used when the edge set is small
  (edges ≪ docs for dedup workloads; cfg.cc_driver_edge_limit guards it).
- ``label_propagation``: distributed fixpoint of min-label broadcast via
  Ray Data groupby rounds — the scale path for adversarially huge edge sets.
  Converges in O(component diameter) rounds; dup clusters are near-cliques
  (via star pairs to bucket representatives) so diameter is tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


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

    Nodes are whatever hashable key the caller uses (int doc ranks here).
    The representative is the MINIMUM member — the backward-ref analog.
    """
    ds = DisjointSet()
    for a, b in zip(edges_a.tolist(), edges_b.tolist()):
        ds.union(a, b)
    # second pass: min member per root
    root_min: dict = {}
    for x in ds.parent:
        r = ds.find(x)
        m = root_min.get(r)
        if m is None or x < m:
            root_min[r] = x
    return {x: root_min[ds.find(x)] for x in ds.parent}


def assign_clusters(n_or_ids, labels_map: dict) -> pd.DataFrame:
    """Full cluster table over all node ids: singletons keep their own id."""
    ids = np.asarray(n_or_ids)
    cluster = np.array([labels_map.get(int(i), int(i)) for i in ids], dtype=np.int64)
    return pd.DataFrame({"doc_rank": ids.astype(np.int64), "cluster_id": cluster,
                         "is_canonical": ids.astype(np.int64) == cluster})


def label_propagation(edges_ds, max_rounds: int = 50):
    """Distributed min-label propagation over an edges Dataset (cols a,b int64).

    Returns a Dataset (node:int64, label:int64) for every node that appears
    in an edge. Each round: emit (node, min(neighbor_label, own_label)) for
    both endpoints → groupby(node).min. Stops when no label changed
    (checked via a tiny aggregate — the only driver-side value per round).

    Shuffle cost per round: O(E). Edges are pre-deduplicated; hot nodes are
    fine because groupby reduces per-key.
    """
    import ray.data  # noqa: F401  (deferred; driver may not have initialized at import)
    from ray.data.aggregate import Min, Sum

    # initial labels: node -> min neighbor (including self) in one pass
    def seed_batch(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        lab = np.concatenate([np.minimum(a, b), np.minimum(a, b)])
        return pa.table({"node": node, "label": lab})

    labels = (edges_ds.map_batches(seed_batch, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label")))

    for _ in range(max_rounds):
        # join labels onto edges by both endpoints, propagate min
        lab_df = labels  # Dataset(node, label)
        # edge-side: send each endpoint its neighbor's current label.
        # Implemented as: explode edges to (node=b, other=a) + (node=a, other=b),
        # join with labels on node via groupby-cogroup trick: union tag rows.
        def edge_rows(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": np.concatenate([a, b]),
                "other": np.concatenate([b, a]),
            })

        msgs = edges_ds.map_batches(edge_rows, batch_format="pyarrow")
        # label lookup: cogroup (node, other) with (node, label): rename and union
        from pcompress_ray.functions.ops import _null_array

        tagged_l = lab_df.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "other": _null_array(len(t["node"]), pa.int64()),
                                "label": t["label"]}), batch_format="pyarrow")
        tagged_m = msgs.map_batches(
            lambda t: pa.table({"node": t["node"], "other": t["other"],
                                "label": _null_array(len(t["node"]), pa.int64())}),
            batch_format="pyarrow")

        def resolve(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["label"].dropna()
            cur = int(lab.min()) if len(lab) else int(g["node"].iloc[0])
            others = g["other"].dropna().astype(np.int64)
            # outgoing: this node's label to each neighbor, plus keep own
            out_nodes = [int(g["node"].iloc[0])] + [int(o) for o in others]
            out_labels = [cur] * len(out_nodes)
            return pd.DataFrame({"node": out_nodes, "label": out_labels})

        new_labels = (tagged_l.union(tagged_m)
                      .groupby("node").map_groups(resolve, batch_format="pandas")
                      .groupby("node").aggregate(Min("label", alias_name="label")))
        new_labels = new_labels.materialize()
        # convergence: sum of labels strictly decreases each improving round
        old_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        new_sum = new_labels.aggregate(Sum("label", alias_name="s"))["s"]
        labels = new_labels
        if new_sum == old_sum:
            break
    return labels


def components_from_edges(edges_df: pd.DataFrame, all_ranks: np.ndarray,
                          use_driver: bool = True) -> pd.DataFrame:
    """Cluster table (doc_rank, cluster_id, is_canonical) from an edge frame."""
    if len(edges_df) == 0:
        return assign_clusters(all_ranks, {})
    labels = union_find(edges_df["a"].to_numpy(), edges_df["b"].to_numpy())
    return assign_clusters(all_ranks, labels)

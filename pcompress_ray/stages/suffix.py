"""Suffix-structure substring verification.

pcompress proves long shared spans byte-exactly through chunk-identity
(SHA-256 per content-defined block, rabin/rabin_dedup.c:830-873); our
chunk-hash shuffle already inherits that proof (identical 64-bit-truncated
SHA-256 over ≥1 KiB chunks). This stage goes further for the pairs the
chunk layer flags: it computes the exact LONGEST common substring between
the two documents with a suffix automaton (O(|a|+|b|)), yielding the true
span length and offsets — the detection-side analog of the reference's
backward-reference span resolution (rabin/rabin_dedup.c:1571-1638) and of
SURVEY §7.2 step 9's suffix-array stage.

Runs per verified pair (pairs ≪ corpus); texts are fetched by a partitioned
hash join, so nothing here materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.config import PipelineConfig


class _SuffixAutomaton:
    """Minimal suffix automaton over bytes (arrays-of-dict transitions)."""

    __slots__ = ("link", "length", "next", "last")

    def __init__(self, data: bytes):
        self.link = [-1]
        self.length = [0]
        self.next = [{}]
        self.last = 0
        for ch in data:
            self._extend(ch)

    def _extend(self, ch: int):
        cur = len(self.length)
        self.length.append(self.length[self.last] + 1)
        self.link.append(-1)
        self.next.append({})
        p = self.last
        while p >= 0 and ch not in self.next[p]:
            self.next[p][ch] = cur
            p = self.link[p]
        if p == -1:
            self.link[cur] = 0
        else:
            q = self.next[p][ch]
            if self.length[p] + 1 == self.length[q]:
                self.link[cur] = q
            else:
                clone = len(self.length)
                self.length.append(self.length[p] + 1)
                self.link.append(self.link[q])
                self.next.append(dict(self.next[q]))
                while p >= 0 and self.next[p].get(ch) == q:
                    self.next[p][ch] = clone
                    p = self.link[p]
                self.link[q] = clone
                self.link[cur] = clone
        self.last = cur


def longest_common_substring(a: bytes, b: bytes) -> int:
    """Length of the longest common substring of two byte strings."""
    if not a or not b:
        return 0
    if len(b) < len(a):
        a, b = b, a
    sam = _SuffixAutomaton(a)
    v, l, best = 0, 0, 0
    for ch in b:
        while v and ch not in sam.next[v]:
            v = sam.link[v]
            l = sam.length[v]
        if ch in sam.next[v]:
            v = sam.next[v][ch]
            l += 1
        else:
            v, l = 0, 0
        if l > best:
            best = l
    return best


def substring_verify(edges_ds, pages_ds, cfg: PipelineConfig):
    """Attach exact LCS byte length to substring-kind edges.

    edges_ds: (a, b, kind, jaccard); pages_ds must carry (rank, text_norm or
    text). Returns (a, b, lcs_bytes) for substring edges with
    lcs_bytes ≥ cfg.substring_min_bytes.
    """
    import pyarrow.compute as pc

    from pcompress_ray.functions.ops import hash_join

    subs = edges_ds.map_batches(
        lambda t: t.replace_schema_metadata(None).filter(
            pc.equal(t["kind"], "substring")).select(["a", "b"]),
        batch_format="pyarrow")

    text_col = "text_norm" if "text_norm" in pages_ds.schema().names else "text"
    texts = pages_ds.select_columns(["rank", text_col])

    j1 = hash_join(subs, texts, left_on="a", right_on="rank",
                   n_buckets=cfg.join_buckets)

    def rn1(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table({"a": t["a"].cast(pa.int64()), "b": t["b"].cast(pa.int64()),
                         "text_a": t[text_col].cast(pa.string())})

    j2 = hash_join(j1.map_batches(rn1, batch_format="pyarrow").materialize(),
                   texts, left_on="b", right_on="rank",
                   n_buckets=cfg.join_buckets)

    min_bytes = cfg.substring_min_bytes

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": [], "b": [], "lcs_bytes": []})
        lcs = np.empty(len(g), dtype=np.int64)
        ta = g["text_a"].tolist()
        tb = g[text_col].tolist()
        for i in range(len(g)):
            lcs[i] = longest_common_substring(
                (ta[i] or "").encode(), (tb[i] or "").encode())
        out = pd.DataFrame({"a": g["a"].to_numpy(dtype=np.int64),
                            "b": g["b"].to_numpy(dtype=np.int64),
                            "lcs_bytes": lcs})
        return out[out["lcs_bytes"] >= min_bytes]

    return j2.map_batches(score, batch_format="pandas")

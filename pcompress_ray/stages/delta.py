"""Similarity-delta encoding: near-duplicate documents stored as
copy/literal deltas against their cluster canonical.

The reference's similarity dedup emits DELTA backward refs — a similar
chunk is bsdiff'd against its matched base and decode applies bspatch
(rabin/rabin_dedup.c:846-929 similarity match path, delta ref emission
:1300-1346, bspatch on decode :1678-1708). This module is the document-level
analog built on machinery we already trust:

- ``delta_encode(base, target)``: encode ``target`` as a sequence of
  COPY(base_off, len) / LITERAL(bytes) ops. Copy anchors come from
  ``stages.suffix.shared_spans`` (CDC-anchored maximal shared spans, byte
  verified) — the same spans the substring stage reports, so the encoder
  inherits its correctness argument. Greedy left-to-right selection over
  the target; overlapping anchors are trimmed, never dropped.
- ``delta_decode(base, delta)``: apply the ops — pure concatenation, no
  searching, mirroring bspatch's role (decode is cheap, encode does the
  work).
- ``delta_encode_members``: pipeline stage — for every non-canonical
  member of a dedup cluster, fetch the canonical's text via one
  rank-keyed hash join and emit (rank, base_rank, delta, delta_len,
  orig_len) for members whose delta actually saves bytes (gain gate,
  A3 analog); others pass through with a null delta.

Wire format (little-endian): repeated ops
  0x00 <u32 len> <len literal bytes>
  0x01 <u32 len> <u64 base_off>
Decoded length is the sum of op lens; no header needed.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from pcompress_ray.config import PipelineConfig

_LIT = 0
_CPY = 1
# format strings, not precompiled struct.Struct objects: this module travels
# to Ray workers pickled BY VALUE (runtime.register_for_ray), and
# _struct.Struct instances are unpicklable
_FMT_LIT = "<BI"
_FMT_CPY = "<BIQ"
_LIT_SIZE = struct.calcsize(_FMT_LIT)
_CPY_SIZE = struct.calcsize(_FMT_CPY)


def _lcs_spans(a: bytes, b: bytes, a0: int, b0: int,
               out: list, min_copy: int, depth: int) -> None:
    """Divide-and-conquer common spans via the suffix stage's exact LCS:
    anchor on the longest common substring, recurse left and right of it.
    Used when documents are too short for CDC anchors."""
    if len(a) < min_copy or len(b) < min_copy or depth > 16:
        return
    from pcompress_ray.stages.suffix import lcs_with_offsets

    ln, ia, ib = lcs_with_offsets(a, b)
    if ln < min_copy:
        return
    out.append((a0 + ia, b0 + ib, ln))
    _lcs_spans(a[:ia], b[:ib], a0, b0, out, min_copy, depth + 1)
    _lcs_spans(a[ia + ln:], b[ib + ln:], a0 + ia + ln, b0 + ib + ln,
               out, min_copy, depth + 1)


def delta_encode(base: bytes, target: bytes, min_block: int = 1024,
                 max_block: int = 65536, min_copy: int = 64) -> bytes:
    """Copy/literal delta of ``target`` against ``base``.

    ``min_copy``: spans shorter than this stay literal (a copy op costs 13
    bytes; tiny copies also fragment the decode). Always round-trips:
    ``delta_decode(base, delta_encode(base, t)) == t`` for any inputs.
    """
    spans = []
    if base and target:
        from pcompress_ray.stages.suffix import shared_spans

        spans = shared_spans(base, target, min_block, max_block)
        if not spans:
            # documents shorter than the CDC candidate spacing (~1 KiB)
            # produce no chunk anchors; recurse on the exact LCS instead
            # (divide-and-conquer diff — each level splits around the
            # longest verified common substring)
            _lcs_spans(base, target, 0, 0, spans, min_copy, 0)
    # greedy left-to-right over the TARGET: spans sorted by b_off; trim
    # overlap with what's already covered, keep if the remainder is still
    # worth a copy op
    spans.sort(key=lambda s: s[1])
    out = bytearray()
    cursor = 0
    n = len(target)

    def emit_literal(lo: int, hi: int):
        while lo < hi:
            ln = min(hi - lo, 0xFFFFFFFF)
            out.extend(struct.pack(_FMT_LIT, _LIT, ln))
            out.extend(target[lo:lo + ln])
            lo += ln

    for a_off, b_off, ln in spans:
        if b_off + ln <= cursor:
            continue
        if b_off < cursor:                      # trim the already-covered head
            a_off += cursor - b_off
            ln -= cursor - b_off
            b_off = cursor
        if ln < min_copy:
            continue
        emit_literal(cursor, b_off)
        out.extend(struct.pack(_FMT_CPY, _CPY, ln, a_off))
        cursor = b_off + ln
    emit_literal(cursor, n)
    return bytes(out)


def delta_decode(base: bytes, delta: bytes) -> bytes:
    """Apply a delta — sequential literal copies + base slices (bspatch
    analog: no searching on decode)."""
    out = bytearray()
    i = 0
    n = len(delta)
    while i < n:
        tag = delta[i]
        if tag == _LIT:
            _, ln = struct.unpack_from(_FMT_LIT, delta, i)
            i += _LIT_SIZE
            out.extend(delta[i:i + ln])
            i += ln
        elif tag == _CPY:
            _, ln, off = struct.unpack_from(_FMT_CPY, delta, i)
            i += _CPY_SIZE
            out.extend(base[off:off + ln])
        else:
            raise ValueError(f"bad delta op tag {tag}")
    return bytes(out)


def delta_encode_members(clusters_ds, pages_ds, cfg: PipelineConfig | None = None,
                         text_col: str = "text",
                         max_delta_ratio: float = 0.5,
                         broadcast_member_limit: int = 5_000_000):
    """Delta-encode every non-canonical cluster member against its canonical.

    clusters_ds: (rank, cluster_id, is_canonical) — ``cluster_id`` is the
    canonical member's rank (resolve_components emits min-rank labels).
    pages_ds: (rank, <text_col>).

    Emits one row per non-canonical member:
      (rank, base_rank, orig_len, delta_len, text_sha256[, url],
       delta (binary, null when the delta exceeds ``max_delta_ratio`` ×
       orig_len — the gain gate: such members are cheaper stored whole)).

    Scale shape: when the member map fits the driver
    (≤ ``broadcast_member_limit`` pairs, 16 B each) it is broadcast via
    ``ray.put`` and ONE pass over pages emits (pair, side, text) rows —
    member text once, canonical text once per member — into a single
    pair-keyed exchange (measured 3× faster than the join path at 40k
    docs/12k members). Beyond the limit, two rank-keyed hash joins do the
    same co-location without any driver state.
    """
    cfg = cfg or PipelineConfig()

    import pyarrow.compute as pc

    members = clusters_ds.map_batches(
        lambda t: t.replace_schema_metadata(None).filter(
            pc.invert(t["is_canonical"].cast(pa.bool_()))
        ).select(["rank", "cluster_id"]),
        batch_format="pyarrow").materialize()

    carry_url = "url" in pages_ds.schema().names
    texts = pages_ds.select_columns(
        ["rank", text_col] + (["url"] if carry_url else []))
    min_block, max_block = cfg.min_block_size, cfg.max_block_size

    if members.count() <= broadcast_member_limit:
        return _members_broadcast_path(
            members, texts, cfg, text_col, carry_url,
            max_delta_ratio, min_block, max_block)

    from pcompress_ray.functions.ops import hash_join

    j1 = hash_join(members, texts, left_on="rank", right_on="rank",
                   n_buckets=cfg.join_buckets)

    def rn(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        cols = {
            "rank": t["rank"].cast(pa.int64()),
            "base_rank": t["cluster_id"].cast(pa.int64()),
            "member_text": t[text_col].cast(pa.string())}
        if carry_url:
            cols["url"] = t["url"].cast(pa.string())
        return pa.table(cols)

    j2 = hash_join(j1.map_batches(rn, batch_format="pyarrow"), texts,
                   left_on="base_rank", right_on="rank",
                   n_buckets=cfg.join_buckets)

    def encode(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return _encode_rows(
            t["rank"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["base_rank"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["member_text"].to_pylist(), t[text_col].to_pylist(),
            t["url"].to_pylist() if "url" in t.column_names else None,
            max_delta_ratio, min_block, max_block)

    return j2.map_batches(encode, batch_format="pyarrow",
                          batch_size=cfg.batch_size)


def _encode_rows(ranks, bases, mtexts, btexts, urls,
                 max_delta_ratio, min_block, max_block) -> pa.Table:
    """Shared encode core: one output row per (member, base) text pair."""
    import hashlib

    orig_l, delta_l, deltas, shas = [], [], [], []
    for mt, bt in zip(mtexts, btexts):
        target = (mt or "").encode("utf-8", "surrogatepass")
        base = (bt or "").encode("utf-8", "surrogatepass")
        d = delta_encode(base, target, min_block, max_block)
        orig_l.append(len(target))
        shas.append(hashlib.sha256(target).hexdigest())
        if len(target) and len(d) <= max_delta_ratio * len(target):
            delta_l.append(len(d))
            deltas.append(d)
        else:
            delta_l.append(-1)              # gain gate: store whole instead
            deltas.append(None)
    cols = {
        "rank": pa.array(np.asarray(ranks, dtype=np.int64)),
        "base_rank": pa.array(np.asarray(bases, dtype=np.int64)),
        "orig_len": pa.array(np.asarray(orig_l, dtype=np.int64)),
        "delta_len": pa.array(np.asarray(delta_l, dtype=np.int64)),
        "delta": pa.array(deltas, pa.binary()),
        "text_sha256": pa.array(shas, pa.string()),
    }
    if urls is not None:
        cols["url"] = pa.array(urls, pa.string())
    return pa.table(cols)


def _members_broadcast_path(members, texts, cfg, text_col, carry_url,
                            max_delta_ratio, min_block, max_block):
    """Broadcast member map + ONE pass over pages + one pair-keyed exchange.

    Each page row fans out to at most (1 + members-of-this-base) rows:
    side 0 = the member's own text, side 1 = its canonical's text (repeated
    per member of that base). All rows of a pair land in one partition.
    """
    import ray

    from pcompress_ray.functions.ops import grouped_partitions

    mdf = members.to_pandas()
    m_ranks = mdf["rank"].to_numpy(dtype=np.int64)
    m_bases = mdf["cluster_id"].to_numpy(dtype=np.int64)
    order = np.argsort(m_ranks)
    mr_s, mb_s = m_ranks[order], m_bases[order]
    border = np.argsort(m_bases, kind="stable")
    b_sorted, b_members = m_bases[border], m_ranks[border]
    ref = ray.put((mr_s, mb_s, b_sorted, b_members))

    def emit(t: pa.Table) -> pa.Table:
        mr, mb, bs, bm = ray.get(ref)      # zero-copy local plasma read
        t = t.replace_schema_metadata(None)
        ranks = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        text_arr = t[text_col].cast(pa.string()).combine_chunks()
        url_arr = (t["url"].cast(pa.string()).combine_chunks()
                   if carry_url else None)

        idx = np.searchsorted(mr, ranks)
        is_mem = (idx < mr.size) & (mr[np.minimum(idx, mr.size - 1)] == ranks)
        lo = np.searchsorted(bs, ranks, side="left")
        hi = np.searchsorted(bs, ranks, side="right")

        # side-0 rows: each member emits its own text once
        sel = np.flatnonzero(is_mem)
        # side-1 rows: each base row fans out once per member of that base
        cnt = hi - lo
        tot = int(cnt.sum())
        src = (np.repeat(lo, cnt)
               + (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt)))
        base_row = np.repeat(np.arange(ranks.size, dtype=np.int64), cnt)

        pair = np.concatenate([ranks[sel], bm[src]])
        side = np.concatenate([np.zeros(sel.size, np.int8),
                               np.ones(tot, np.int8)])
        base_rank = np.concatenate([mb[idx[sel]], ranks[base_row]])
        take_idx = np.concatenate([sel, base_row])
        text_out = text_arr.take(pa.array(take_idx, pa.int64()))
        if carry_url:
            url_out = pa.concat_arrays([
                url_arr.take(pa.array(sel, pa.int64())),
                pa.array([""] * tot, pa.string())])
        else:
            url_out = pa.array([""] * (sel.size + tot), pa.string())
        return pa.table({
            "pair": pa.array(pair),
            "side": pa.array(side),
            "base_rank": pa.array(base_rank),
            "text": text_out,
            "url": url_out,
        })

    rows = texts.map_batches(emit, batch_format="pyarrow",
                             batch_size=cfg.batch_size)

    def pair_encode(part: pd.DataFrame) -> pa.Table:
        if len(part) == 0:
            return _encode_rows([], [], [], [], [] if carry_url else None,
                                max_delta_ratio, min_block, max_block)
        part = part.sort_values(["pair", "side"])
        pr = part["pair"].to_numpy(dtype=np.int64)
        sd = part["side"].to_numpy(dtype=np.int8)
        br = part["base_rank"].to_numpy(dtype=np.int64)
        tx = part["text"].tolist()
        ur = part["url"].tolist()
        first = np.ones(pr.size, dtype=bool)
        first[1:] = pr[1:] != pr[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], pr.size)
        ranks, bases, mtexts, btexts, urls = [], [], [], [], []
        for s, e in zip(starts, ends):
            if e - s != 2 or sd[s] != 0 or sd[e - 1] != 1:
                continue                    # incomplete pair: base == member
            ranks.append(int(pr[s])); bases.append(int(br[s]))
            mtexts.append(tx[s]); btexts.append(tx[e - 1]); urls.append(ur[s])
        return _encode_rows(ranks, bases, mtexts, btexts,
                            urls if carry_url else None,
                            max_delta_ratio, min_block, max_block)

    return grouped_partitions(rows, ["pair"], pair_encode)

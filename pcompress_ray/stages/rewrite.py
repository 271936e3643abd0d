"""Corpus-rewriting segment dedup (RefinedWeb/CCNet-style passage removal).

Reference parity: pcompress's fixed-block identity dedup doesn't just COUNT
duplicate blocks — it replaces them with backward references and re-emits
the deduplicated stream (rabin/rabin_dedup.c:711-724 block-index probe +
rabin/rabin_dedup.c:1606-1617 backward-reference emit).  The corpus analog
removes every fixed token segment already seen EARLIER corpus-wide (first
occurrence by (doc_id, seg_no) wins — the same canonical backward order)
and re-emits the REWRITTEN document.  ``q_segment_dedup`` gives the counts;
this stage gives the actual cleaned corpus a training pipeline consumes.

Shape: two hash-partitioned exchanges, both vectorized per partition.

1. segment-keyed (``grouped_partitions`` on ``seg``): every occurrence of a
   segment string co-locates, so global keep-first is one stable sort +
   one shifted-comparison per partition — no per-key Python.
2. doc-keyed: per-doc ``seg_no`` sort, then kept segments are wrapped as an
   Arrow ``ListArray`` at doc boundaries and joined with ONE
   ``pc.binary_join`` kernel — no per-doc string building.

100-TB note: the exchanges carry the corpus text ~2x — irreducible in
spirit (a rewrite must move the text once to co-locate duplicate segments
and once to bring kept segments home), and each leg streams through the
object store with backpressure.  Keying leg 1 on a 128-bit segment hash
with the string carried as payload (not key) halves comparator cost at
scale; the string key is kept here so the DuckDB oracle compares equal
sets with zero collision caveats.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def mark_first_occurrence(part: pd.DataFrame) -> pd.DataFrame:
    """Global keep-first inside one seg-keyed partition.

    All rows of any segment string are guaranteed co-located (hash
    partition on ``seg``), so the first row of each run after a stable
    (seg, doc_id, seg_no) sort is the corpus-wide first occurrence.
    """
    part = part.sort_values(["seg", "doc_id", "seg_no"], kind="stable")
    segv = part["seg"].to_numpy()
    keep = np.empty(len(part), dtype=bool)
    if len(part):
        keep[0] = True
        keep[1:] = segv[1:] != segv[:-1]
    return pd.DataFrame({
        "doc_id": part["doc_id"].to_numpy(np.int64),
        "seg_no": part["seg_no"].to_numpy(np.int64),
        "seg": segv,
        "keep": keep.astype(np.int8),
    })


def reassemble_docs(part: pd.DataFrame) -> pd.DataFrame:
    """Rebuild one doc-keyed partition's documents from kept segments.

    Vectorized: one (doc_id, seg_no) sort, doc boundaries by shifted
    comparison, kept rows wrapped as a ListArray at per-doc offsets and
    joined by a single ``pc.binary_join`` call.  Docs whose every segment
    was a duplicate still emit a row (empty ``new_text``).
    """
    import pyarrow.compute as pc

    if not len(part):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_segs": pd.Series([], dtype=np.int64),
                             "n_kept": pd.Series([], dtype=np.int64),
                             "new_text": pd.Series([], dtype=object)})
    part = part.sort_values(["doc_id", "seg_no"], kind="stable")
    doc = part["doc_id"].to_numpy(np.int64)
    keep = part["keep"].to_numpy(np.int8).astype(bool)
    first = np.empty(doc.size, dtype=bool)
    first[0] = True
    first[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, doc.size))
    doc_ids = doc[starts]
    n_kept = np.add.reduceat(keep.astype(np.int64), starts)
    # offsets of kept rows at doc boundaries: cumulative kept count at
    # each doc start (exclusive prefix), closed by the total.
    ck = np.cumsum(keep.astype(np.int64))
    off = np.empty(starts.size + 1, dtype=np.int64)
    off[0] = 0
    off[1:] = ck[starts + sizes - 1]
    segs_kept = part["seg"].to_numpy()[keep]
    # int64 (large-list) offsets: a >2^31-line partition must not wrap
    lst = pa.LargeListArray.from_arrays(pa.array(off),
                                        pa.array(segs_kept, pa.string()))
    new_text = pc.binary_join(lst, " ").to_pandas()
    return pd.DataFrame({"doc_id": doc_ids,
                         "n_segs": sizes.astype(np.int64),
                         "n_kept": n_kept,
                         "new_text": new_text.to_numpy()})


def segment_dedup_rewrite(ds, w: int = 10, n_parts: int = 32):
    """documents Dataset -> (doc_id, n_segs, n_kept, new_text) Dataset.

    ``ds`` must carry ``doc_id`` and ``text``.  Segmentation is the same
    fixed ``w``-token window as ``stages/textstats.doc_segments`` (the
    reference's ``-F`` fixed-block chunker analog), so counts agree with
    ``q_segment_dedup`` exactly.
    """
    from pcompress_ray.functions.ops import grouped_partitions
    from pcompress_ray.stages.textstats import doc_segments

    segs = ds.map_batches(lambda t: doc_segments(t, w=w),
                          batch_format="pyarrow")
    marked = grouped_partitions(segs, ["seg"], mark_first_occurrence,
                                n_parts=n_parts)
    return grouped_partitions(marked, ["doc_id"], reassemble_docs,
                              n_parts=n_parts)


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup (CCNet / RefinedWeb-style)
# ---------------------------------------------------------------------------

# exactly the chars Python would strip minus '\n' (already the separator);
# an EXPLICIT set so the DuckDB oracle's trim(line, ...) is bit-identical
_LINE_TRIM_CHARS = " \t\r\x0b\x0c"


def explode_lines(t: pa.Table, carry_cols: tuple = ()) -> pa.Table:
    """documents batch -> one row per line: (doc_id, line_no, line, key
    [, carry...]).

    Fully vectorized Arrow: one split_pattern over the batch, doc ids and
    line numbers from the ListArray offsets, key = whitespace-trimmed line
    (the dedup identity; the raw line rides along for lossless reassembly).
    Each ``carry_cols`` column rides on the doc's line_no==0 row only
    (null on every other line), so per-doc metadata crosses the line-keyed
    exchange once per DOC, not once per line.
    """
    import pyarrow.compute as pc

    t = t.replace_schema_metadata(None)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    txt = pc.coalesce(t["text"].combine_chunks()
                      if isinstance(t["text"], pa.ChunkedArray) else t["text"],
                      pa.scalar("", pa.string()))
    lst = pc.split_pattern(txt, pattern="\n")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    off = lst.offsets.to_numpy().astype(np.int64)
    sizes = np.diff(off)
    doc_rep = np.repeat(ids, sizes)
    line_no = np.arange(off[-1] - off[0], dtype=np.int64) \
        - np.repeat(off[:-1] - off[0], sizes)
    lines = lst.flatten()
    key = pc.utf8_trim(lines, characters=_LINE_TRIM_CHARS)
    cols = {"doc_id": pa.array(doc_rep),
            "line_no": pa.array(line_no),
            "line": lines,
            "key": key}
    if carry_cols:
        # scatter each doc's value to its first line; every split list has
        # >= 1 element (split of "" is [""]), so line 0 always exists
        first_idx = (off[:-1] - off[0]).astype(np.int64)
        n_lines = int(off[-1] - off[0])
        take_idx = np.full(n_lines, -1, np.int64)
        take_idx[first_idx] = np.arange(len(ids), dtype=np.int64)
        idx_arr = pa.array(take_idx, mask=take_idx < 0)
        for c in carry_cols:
            col = t[c].combine_chunks() \
                if isinstance(t[c], pa.ChunkedArray) else t[c]
            cols[c] = col.take(idx_arr)
    return pa.table(cols)


def mark_dup_lines(min_docs: int, carry_cols: tuple = ()):
    """Per key-partition: remove EVERY occurrence of a non-blank line whose
    trimmed form appears in >= min_docs DISTINCT documents (boilerplate —
    nav bars / cookie banners / footers — should vanish everywhere, unlike
    the keep-first segment rewrite above). Blank-after-trim lines are
    structural and never removed. ``carry_cols`` pass through untouched."""

    def run(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            out = {"doc_id": pd.Series([], dtype=np.int64),
                   "line_no": pd.Series([], dtype=np.int64),
                   "line": pd.Series([], dtype=object),
                   "keep": pd.Series([], dtype=np.int8)}
            out.update({c: pd.Series([], dtype=object)
                        for c in carry_cols})
            return pd.DataFrame(out)
        part = part.sort_values(["key", "doc_id"], kind="stable")
        keyv = part["key"].to_numpy()
        docv = part["doc_id"].to_numpy(np.int64)
        n = len(part)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keyv[1:] != keyv[:-1]
        new_pair = new_key.copy()
        new_pair[1:] |= docv[1:] != docv[:-1]
        # distinct-doc count per key: reduceat of pair-first flags
        starts = np.flatnonzero(new_key)
        n_docs = np.add.reduceat(new_pair.astype(np.int64), starts)
        per_row = np.repeat(n_docs, np.diff(np.append(starts, n)))
        remove = (per_row >= min_docs) & (keyv != "")
        out = {"doc_id": docv,
               "line_no": part["line_no"].to_numpy(np.int64),
               "line": part["line"].to_numpy(),
               "keep": (~remove).astype(np.int8)}
        out.update({c: part[c].to_numpy() for c in carry_cols})
        return pd.DataFrame(out)

    return run


def reassemble_lines(part: pd.DataFrame,
                     carry_cols: tuple = ()) -> pd.DataFrame:
    """Doc-keyed partition -> (doc_id, n_lines, n_kept, new_text
    [, carry...]), kept lines re-joined with a single binary_join at
    per-doc ListArray offsets (same vectorized shape as reassemble_docs).
    Carried values are read from each doc's line_no==0 row (where
    explode_lines put them)."""
    import pyarrow.compute as pc

    if not len(part):
        out = {"doc_id": pd.Series([], dtype=np.int64),
               "n_lines": pd.Series([], dtype=np.int64),
               "n_kept": pd.Series([], dtype=np.int64),
               "new_text": pd.Series([], dtype=object)}
        out.update({c: pd.Series([], dtype=object) for c in carry_cols})
        return pd.DataFrame(out)
    part = part.sort_values(["doc_id", "line_no"], kind="stable")
    doc = part["doc_id"].to_numpy(np.int64)
    keep = part["keep"].to_numpy(np.int8).astype(bool)
    first = np.empty(doc.size, dtype=bool)
    first[0] = True
    first[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, doc.size))
    n_kept = np.add.reduceat(keep.astype(np.int64), starts)
    ck = np.cumsum(keep.astype(np.int64))
    off = np.empty(starts.size + 1, dtype=np.int64)
    off[0] = 0
    off[1:] = ck[starts + sizes - 1]
    kept_lines = part["line"].to_numpy()[keep]
    # int64 (large-list) offsets: a >2^31-line partition must not wrap
    lst = pa.LargeListArray.from_arrays(pa.array(off),
                                        pa.array(kept_lines, pa.string()))
    new_text = pc.binary_join(lst, "\n").to_pandas()
    out = {"doc_id": doc[starts],
           "n_lines": sizes.astype(np.int64),
           "n_kept": n_kept,
           "new_text": new_text.to_numpy()}
    # line_no==0 is the first row of each doc segment after the sort
    out.update({c: part[c].to_numpy()[starts] for c in carry_cols})
    return pd.DataFrame(out)


def line_dedup_rewrite(ds, min_docs: int = 2, n_parts: int = 32,
                       carry_cols: tuple = ()):
    """documents Dataset -> (doc_id, n_lines, n_kept, new_text
    [, carry...]) Dataset.

    CCNet/RefinedWeb-style line-level corpus cleaning: a line (trimmed of
    horizontal whitespace) occurring in >= ``min_docs`` distinct documents
    is boilerplate and removed from EVERY document; blank lines and unique
    lines pass through byte-identical. Complements segment_dedup_rewrite
    (keep-first passage dedup): this is the remove-all template scrubber.

    Shape mirrors the reference's fixed-block dedup rewrite
    (rabin/rabin_dedup.c:711-724 index probe + :1606-1617 re-emit) at line
    granularity: two hash-partitioned exchanges, both vectorized.

    100-TB note: the text crosses the exchange twice (once keyed by line to
    co-locate duplicates, once keyed by doc to reassemble) and streams with
    backpressure; there is no driver materialization and no broadcast set
    (unlike a collect-dup-keys design, this stays correct when the
    boilerplate set itself is huge). ``carry_cols`` (e.g. url) ride each
    doc's line_no==0 row through both exchanges — one value per DOC on the
    wire — so callers that need per-doc metadata on the rewritten output
    skip a third all-to-all hash join entirely (the curate funnel's
    line-scrub stage).
    """
    from pcompress_ray.functions.ops import grouped_partitions

    carry = tuple(carry_cols)
    lines = ds.map_batches(lambda t: explode_lines(t, carry),
                           batch_format="pyarrow")
    marked = grouped_partitions(lines, ["key"],
                                mark_dup_lines(min_docs, carry),
                                n_parts=n_parts)
    return grouped_partitions(
        marked, ["doc_id"],
        lambda part: reassemble_lines(part, carry), n_parts=n_parts)

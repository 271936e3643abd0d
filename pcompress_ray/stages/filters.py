"""Preprocessing filters: Delta2 strided-RLE + LZP (archive ratio path).

The reference auto-enables two preprocessing passes ahead of the main codec
at level > 4 (pcompress.c:3698-3741): Delta2 — RLE of strided arithmetic
progressions (filters/delta2/delta2.c:112-330: per-4K block, try strides
{2,4,8,3,5,6,7} as little-endian words, runs of constant difference longer
than rle_thresh become (count, initial, delta) records) — and LZP
(filters/lzp/lzp.c: longest-previous-match prediction via a context-hash
table, matches replaced by an escape + length).

Both are reimplemented from scratch with our OWN record formats (the wire
format is this repo's archive, not .pz):

Delta2 (numpy-vectorized, the hot-capable one): records are
    u64 header  — low 56 bits = byte count, top byte = 0 (literal) or the
                  stride (delta run)
    literal     — count raw bytes follow
    delta run   — u64 initial + u64 step follow; bytes reconstruct as the
                  little-endian stride-width sequence initial, initial+step,
                  ... (mod 2^(8·stride))
prefixed by one u64 of original length. The stride scan is one vectorized
pass per (block, stride) — np.diff over the strided word view + run
boundaries — not a per-byte loop.

LZP is a faithful but per-byte-Python coder (the algorithm is inherently
sequential): context-hash table of last positions, matches ≥ min_len
replaced by ESC + varint length; ~1 MB/s in CPython. It is therefore
DEFAULT-OFF and documented as a ratio-only option for cold archival data —
enable via PipelineConfig.archive_filters=("delta2", "lzp").
"""

from __future__ import annotations

import struct

import numpy as np

_STRIDES = (2, 4, 8, 3, 5, 6, 7)   # delta2.c:96 order preserved
_BLOCK = 4096                      # delta2.c DELTA2_CHUNK
_CNT_MASK = (1 << 56) - 1


def _word_view(block: np.ndarray, s: int) -> np.ndarray:
    """Little-endian s-byte words of a uint8 block (vectorized)."""
    n = block.size // s
    m = block[: n * s].reshape(n, s).astype(np.uint64)
    return (m << (np.arange(s, dtype=np.uint64) * np.uint64(8))).sum(
        axis=1, dtype=np.uint64)


def _scan_stride(block: np.ndarray, s: int, rle_thresh: int):
    """Delta runs for one stride: list of (byte_off, byte_len, init, step)
    plus the estimated encoded size of the block under this stride."""
    vals = _word_view(block, s)
    if vals.size < 3:
        return None, block.size + 8
    d = np.diff(vals)
    # run starts where the diff changes
    chg = np.flatnonzero(d[1:] != d[:-1]) + 1
    starts = np.concatenate([[0], chg])
    ends = np.concatenate([chg, [d.size]])
    run_words = ends - starts + 1          # values covered per run
    run_bytes = run_words * s
    keep = run_bytes > rle_thresh
    runs = []
    est = 8  # literal header allowance
    prev_end = 0
    for st, en, rb in zip(starts[keep], ends[keep], run_bytes[keep]):
        lit = st * s - prev_end
        est += lit + (8 if lit else 0) + 24
        runs.append((int(st * s), int(rb), int(vals[st]), int(d[st])))
        prev_end = st * s + rb
    est += block.size - prev_end
    return runs, est


def delta2_encode(data: bytes, rle_thresh: int = 50) -> bytes | None:
    """Encode, or None when no block shrinks (the reference's -1 path)."""
    if len(data) < 32 or len(data) > _CNT_MASK or rle_thresh < 50:
        return None
    arr = np.frombuffer(data, dtype=np.uint8)
    out = [struct.pack("<Q", len(data))]
    lit_start = 0   # pending literal span start (merged across blocks)
    lit_end = 0
    gained = False

    def flush_literal():
        nonlocal lit_start, lit_end
        if lit_end > lit_start:
            out.append(struct.pack("<Q", lit_end - lit_start))
            out.append(data[lit_start:lit_end])
        lit_start = lit_end

    for b0 in range(0, len(data), _BLOCK):
        block = arr[b0 : b0 + _BLOCK]
        best_runs, best_est = None, block.size + 8
        for s in _STRIDES:
            runs, est = _scan_stride(block, s, rle_thresh)
            if runs and est < best_est:
                best_runs, best_est, best_s = runs, est, s
        if not best_runs:
            lit_end = b0 + block.size
            continue
        gained = True
        for off, blen, init, step in best_runs:
            if b0 + off > lit_end:
                lit_end = b0 + off
            flush_literal()
            out.append(struct.pack(
                "<QQQ", (best_s << 56) | blen, init, step))
            lit_start = lit_end = b0 + off + blen
        lit_end = b0 + block.size
    flush_literal()
    if not gained:
        return None
    enc = b"".join(out)
    return enc if len(enc) < len(data) else None


def delta2_decode(buf: bytes) -> bytes:
    (srclen,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    out = bytearray()
    while len(out) < srclen:
        (hdr,) = struct.unpack_from("<Q", buf, pos)
        pos += 8
        cnt, s = hdr & _CNT_MASK, hdr >> 56
        if s == 0:
            out += buf[pos : pos + cnt]
            pos += cnt
        else:
            init, step = struct.unpack_from("<QQ", buf, pos)
            pos += 16
            n = cnt // s
            mask = np.uint64((1 << (8 * s)) - 1) if s < 8 \
                else np.uint64(0xFFFFFFFFFFFFFFFF)
            vals = (np.uint64(init)
                    + np.uint64(step) * np.arange(n, dtype=np.uint64)) & mask
            by = (vals[:, None] >> (np.arange(s, dtype=np.uint64)
                                    * np.uint64(8))).astype(np.uint8)
            out += by.tobytes()
    assert len(out) == srclen, (len(out), srclen)
    return bytes(out)


_ESC = 0xF2           # lzp.c LZP matchFlag analog
_HASH_BITS = 16
_MIN_LEN = 32


def lzp_encode(data: bytes, min_len: int = _MIN_LEN,
               hash_bits: int = _HASH_BITS) -> bytes | None:
    """Context-hash match prediction; None when no gain. Per-byte Python —
    see module docstring (default-off, cold-data ratio option).

    Wire: u64 srclen, 4 verbatim bytes, then a byte stream where ESC is
    followed by a u32: 0 = a literal ESC byte, v>0 = copy (min_len + v - 1)
    bytes from the predicted position. Both coders maintain the identical
    position table (hash of the last 4 bytes -> position), so the match
    source needs no offset on the wire — that is LZP\'s defining trick.
    """
    n = len(data)
    if n < min_len + 8:
        return None
    table = [0] * (1 << hash_bits)
    mask = (1 << hash_bits) - 1
    out = bytearray(struct.pack("<Q", n))
    out += data[:4]
    i = 4
    while i < n:
        h = ((int.from_bytes(data[i - 4 : i], "little")
              * 2654435761) >> (32 - hash_bits)) & mask
        cand = table[h]
        table[h] = i
        if cand and data[cand : cand + min_len] == data[i : i + min_len] \
                and i + min_len <= n:
            m = min_len
            while i + m < n and data[cand + m] == data[i + m]:
                m += 1
            out.append(_ESC)
            out += struct.pack("<I", m - min_len + 1)
            i += m
        else:
            c = data[i]
            out.append(c)
            if c == _ESC:
                out += struct.pack("<I", 0)
            i += 1
    enc = bytes(out)
    return enc if len(enc) < n else None


def lzp_decode(buf: bytes, min_len: int = _MIN_LEN,
               hash_bits: int = _HASH_BITS) -> bytes:
    (srclen,) = struct.unpack_from("<Q", buf, 0)
    table = [0] * (1 << hash_bits)
    mask = (1 << hash_bits) - 1
    out = bytearray(buf[8:12])
    pos = 12
    while len(out) < srclen:
        i = len(out)
        h = ((int.from_bytes(bytes(out[i - 4 : i]), "little")
              * 2654435761) >> (32 - hash_bits)) & mask
        cand = table[h]
        table[h] = i
        c = buf[pos]
        pos += 1
        if c == _ESC:
            (v,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if v == 0:
                out.append(_ESC)
            else:
                m = min_len + v - 1
                for k in range(m):  # may self-overlap — byte-wise copy
                    out.append(out[cand + k])
        else:
            out.append(c)
    assert len(out) == srclen
    return bytes(out)

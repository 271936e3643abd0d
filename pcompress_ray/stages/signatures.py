"""Signature stage: shingles → MinHash + LSH bands + SimHash + bottom-k sketch.

Document-level reimplementation of the reference's similarity machinery:

- per-block K-min-values sketch (min-heap K-smallest over the block's u64
  words + XXH32, rabin/rabin_dedup.c:684-706, 734-754) and the per-segment
  bottom-k sketch over sorted chunk SHA-256s (rabin/rabin_dedup.c:921-994)
  → 128-permutation MinHash over token shingles (``minhash_signature``) plus
  a bottom-k (KMV) sketch of the shingle set for near-exact Jaccard at
  verify time,
- the ~20 similarity keys per segment probed against the similarity index
  (rabin/rabin_dedup.c:1020-1036) → b×r LSH band hashes emitted as columns,
  later explode + groupby (the shuffle replaces index.c's shared hashtable).

Stateful-stage shape (SURVEY §2.3 T3, create_dedupe_context analog): the
permutation table is built once per actor in ``__init__`` and reused across
batches — pass the class to ``map_batches(SignatureStage, concurrency=N)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pcompress_ray.config import PipelineConfig
from pcompress_ray.hashing import (
    combine_rows,
    hash_strings,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash,
)
from pcompress_ray.stages.extract import tokenize

U64 = np.uint64


def doc_shingles(text: str, k: int) -> np.ndarray:
    """Unique shingle hashes of one document (uint64, sorted)."""
    toks = tokenize(text)
    if not toks:
        return np.empty(0, dtype=U64)
    th = hash_strings(np.asarray(toks, dtype=object))
    if len(toks) < k:
        # short doc: treat the whole token sequence as one shingle so tiny
        # exact dups still match (reference: trailing remainder block,
        # rabin/rabin_dedup.c:716-757)
        sh = shingle_hashes(th, max(1, len(toks)))
    else:
        sh = shingle_hashes(th, k)
    return np.unique(sh)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 shingle sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


class SignatureStage:
    """map_batches actor stage: text_norm → minhash, bands, simhash, kmv.

    Output columns appended:
      - ``n_tokens:int32``
      - ``n_shingles:int32``
      - ``minhash: fixed-size list<uint64>[num_perm]`` (stored as list)
      - ``band_hashes: list<uint64>[lsh_bands]`` — band b's hash combines
        rows [b*r, (b+1)*r); the groupby key later is (band_id, band_hash)
      - ``simhash: uint64``
      - ``kmv: list<uint64>`` — bottom-k shingle hashes (k = cfg.kmv_k) for
        near-exact Jaccard verification without re-reading text
    """

    def __init__(self, cfg: PipelineConfig | None = None, text_col: str = "text_norm"):
        self.cfg = cfg or PipelineConfig()
        self.text_col = text_col
        self.a, self.b = minhash_params(self.cfg.num_perm, self.cfg.minhash_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        batch = batch.replace_schema_metadata(None)
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int32)
        n_shingles = np.zeros(n, dtype=np.int32)
        sigs = np.empty((n, cfg.num_perm), dtype=U64)
        simhashes = np.zeros(n, dtype=U64)
        kmvs = []
        for i, t in enumerate(texts):
            toks = tokenize(t)
            n_tokens[i] = len(toks)
            if toks:
                th = hash_strings(np.asarray(toks, dtype=object))
                k = cfg.shingle_k if len(toks) >= cfg.shingle_k else max(1, len(toks))
                sh = np.unique(shingle_hashes(th, k))
                simhashes[i] = simhash(th)
            else:
                sh = np.empty(0, dtype=U64)
            n_shingles[i] = sh.size
            sigs[i] = minhash_signature(sh, self.a, self.b)
            # bottom-k sketch stored as BINARY (raw little-endian uint64s):
            # binary survives pandas round-trips in joins, unlike list columns
            # which Ray converts to tensor-extension arrays
            kmvs.append(sh[: cfg.kmv_k].tobytes())
        # band hashes: vectorized across the batch, one combine per band
        bands = np.empty((n, cfg.lsh_bands), dtype=U64)
        r = cfg.lsh_rows
        for bnd in range(cfg.lsh_bands):
            bands[:, bnd] = combine_rows(sigs[:, bnd * r : (bnd + 1) * r],
                                         seed=bnd + 1)
        out = batch.append_column("n_tokens", pa.array(n_tokens, type=pa.int32()))
        out = out.append_column("n_shingles", pa.array(n_shingles, type=pa.int32()))
        out = out.append_column("minhash", pa.array(list(sigs), type=pa.list_(pa.uint64())))
        out = out.append_column("band_hashes", pa.array(list(bands), type=pa.list_(pa.uint64())))
        out = out.append_column("simhash", pa.array(simhashes, type=pa.uint64()))
        out = out.append_column("kmv", pa.array(kmvs, type=pa.binary()))
        return out

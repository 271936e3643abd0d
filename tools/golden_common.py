"""Shared digest computations for the golden regression gate
(reference analog: test/backward_compat/ frozen .pz archives + SHA-256 of
decoded payloads, run_backward_compat.sh).

Every digest is a SHA-256 over a canonical, order-independent serialization
of a pipeline artifact on the frozen corpus. A consistent semantic drift in
the CDC constants, the tokenizer/shingle hashing, or the archive wire
format changes the digest even when every relative test (engine == its own
oracle) still passes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

GOLDEN_SEED = 42
GOLDEN_DOCS = 150


def golden_pages() -> pa.Table:
    from pcompress_ray.sources.corpus import make_corpus

    pages, _, _ = make_corpus(GOLDEN_DOCS, GOLDEN_SEED, with_oracle=False)
    return pages


def _sorted_digest(parts: list[bytes]) -> str:
    h = hashlib.sha256()
    for p in sorted(parts):
        h.update(p)
    return h.hexdigest()


def chunk_digest(pages: pa.Table) -> str:
    """SHA-256 over sorted per-doc (url, chunk hashes, chunk lengths) —
    pins the CDC constants (poly/mask/window/min/max) and SHA-256 chunk
    identity. Pure in-process (no Ray)."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.cdc import CDCChunker
    from pcompress_ray.stages.extract import Extractor

    t = CDCChunker(PipelineConfig(), text_col="text_norm")(Extractor()(pages))
    parts = []
    for url, hs, ls in zip(t["url"].to_pylist(),
                           t["chunk_hashes"].to_pylist(),
                           t["chunk_lengths"].to_pylist()):
        parts.append(url.encode()
                     + np.asarray(hs, np.uint64).tobytes()
                     + np.asarray(ls, np.int64).tobytes())
    return _sorted_digest(parts)


def signature_digest(pages: pa.Table) -> str:
    """SHA-256 over sorted per-doc (url, minhash, band hashes, simhash,
    kmv) — pins tokenizer, shingle hashing, MinHash permutations and LSH
    geometry. Pure in-process."""
    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.extract import Extractor
    from pcompress_ray.stages.signatures import SignatureStage

    t = SignatureStage(PipelineConfig())(Extractor()(pages))
    parts = []
    for url, mh, bh, sh, kmv in zip(t["url"].to_pylist(),
                                    t["minhash"].to_pylist(),
                                    t["band_hashes"].to_pylist(),
                                    t["simhash"].to_pylist(),
                                    t["kmv"].to_pylist()):
        parts.append(url.encode()
                     + np.asarray(mh, np.uint64).tobytes()
                     + np.asarray(bh, np.uint64).tobytes()
                     + np.uint64(sh).tobytes() + (kmv or b""))
    return _sorted_digest(parts)


def restore_digest(pages: pa.Table, tmp_dir: str) -> str:
    """SHA-256 over sorted (url, restored text) after an archive
    write→restore round-trip — pins the archive wire format end to end.
    Requires an initialized Ray session."""
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.pipelines.archive import (archive_restore,
                                                 archive_write,
                                                 read_archive, write_archive)

    cfg = PipelineConfig()
    out = write_archive(archive_write(rd.from_arrow(pages), cfg,
                                      text_col="text"), tmp_dir)
    store, manifest, deltas = read_archive(out)
    df = archive_restore(store, manifest, cfg, deltas_ds=deltas).to_pandas()
    assert df["sha_ok"].all()
    return _sorted_digest([u.encode() + b"\x00" + t.encode()
                           for u, t in zip(df["url"], df["text"])])


def cluster_table(pages: pa.Table):
    """Flagship cluster assignment (url, cluster_id, is_canonical), sorted
    by url — the frozen-output analog of the reference's expected decoded
    payloads. Requires Ray."""
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.functions.ops import zip_with_rank
    from pcompress_ray.pipelines.dedup import dedup_pipeline

    res = dedup_pipeline(zip_with_rank(rd.from_arrow(pages), "url"),
                         PipelineConfig(), compute_pairs=False)
    return res.clusters.to_pandas().sort_values("url").reset_index(drop=True)

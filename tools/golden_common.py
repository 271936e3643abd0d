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


def filetype_digest() -> str:
    """SHA-256 over sorted (file_id, detected type) of the deterministic
    35-subtype file corpus — pins the magic-byte tables and extension map
    (M8). Pure in-process."""
    from pcompress_ray.stages.filetype import (detect_types_batch,
                                               make_fake_file_table)

    t = detect_types_batch(make_fake_file_table(repeats=8), path_col="path")
    parts = [f"{i}|{n}".encode()
             for i, n in zip(t["file_id"].to_pylist(),
                             t["ftype_name"].to_pylist())]
    return _sorted_digest(parts)


def image_digest() -> str:
    """SHA-256 over sorted per-image (id, type, w, h, channels, mean_e3)
    from the REAL PNG + JPEG decoders over the synthetic media table —
    pins the T.81 Huffman/IDCT/upsampling path and the PNG unfilter.
    Quantization matches q_image_features exactly."""
    from pcompress_ray.stages.multimodal import (ImageDecodeStage,
                                                 make_fake_media_table)

    t = ImageDecodeStage(dim=16)(make_fake_media_table(200))
    parts = []
    for mid, mt, feat in zip(t["media_id"].to_pylist(),
                             t["media_type_detected"].to_pylist(),
                             t["features"].to_pylist()):
        if mt not in ("image/png", "image/jpeg"):
            continue
        f = np.asarray(feat, np.float32)
        w, h, ch = int(f[0]), int(f[1]), int(f[2])
        mean_e3 = int(np.floor(float(f[3]) * 1e3 + 0.5))
        parts.append(f"{mid}|{mt}|{w}|{h}|{ch}|{mean_e3}".encode())
    return _sorted_digest(parts)


def video_digest() -> str:
    """SHA-256 over sorted per-sampled-frame (media_id, frame_idx, h, w,
    luma_e3) — real RIFF walk + real JPEG decode of every sampled frame
    (the q_video_frames path). Pure in-process."""
    from pcompress_ray.stages.jpeg import decode_jpeg
    from pcompress_ray.stages.multimodal import (FrameSampleStage,
                                                 make_fake_video_table)

    frames = FrameSampleStage(fps_divisor=2, max_frames=4, fake=False)(
        make_fake_video_table(40))
    parts = []
    for mid, idx, payload in zip(frames["media_id"].to_pylist(),
                                 frames["frame_idx"].to_pylist(),
                                 frames["frame_payload"].to_pylist()):
        img = decode_jpeg(payload)
        luma_e3 = int(np.floor(float(img.mean()) * 1e3 + 0.5))
        parts.append(
            f"{mid}|{idx}|{img.shape[0]}|{img.shape[1]}|{luma_e3}".encode())
    return _sorted_digest(parts)


def audio_digest() -> str:
    """SHA-256 over sorted per-clip (id, rate, n_samples, duration_ms,
    zero_crossings, dominant_freq_e3) from the WAV parse + FFT feature
    stage. Pure in-process."""
    from pcompress_ray.stages.multimodal import (AudioFeatureStage,
                                                 make_fake_media_table)

    t = AudioFeatureStage()(make_fake_media_table(200))
    parts = []
    for row in zip(t["media_id"].to_pylist(), t["is_audio"].to_pylist(),
                   t["sample_rate"].to_pylist(), t["n_samples"].to_pylist(),
                   t["duration_ms_decoded"].to_pylist(),
                   t["zero_crossings"].to_pylist(),
                   t["dominant_freq_hz"].to_pylist()):
        mid, is_audio, rate, ns, dur, zc, freq = row
        if not is_audio:
            continue
        freq_e3 = int(np.floor(float(freq) * 1e3 + 0.5))
        parts.append(f"{mid}|{rate}|{ns}|{dur}|{zc}|{freq_e3}".encode())
    return _sorted_digest(parts)

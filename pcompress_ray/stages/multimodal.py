"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata (the reference's file-type tagging, utils/utils.h:276-340 +
archive/pc_arc_filter.c per-type filters, is the byte-level precedent).
The decode/resize/feature kernels themselves are STUBBED — the codec
libraries are not in this container — behind a deterministic fake, but all
Ray-side plumbing (schema contract, actor-pool stage shape, batch sizing,
output layout) is real and tested.

Real-deployment note: decode stages are the canonical actor-pool case (codec
context per actor), with SMALL batch_size (large binary rows — see
memory-aware sizing in the brief) and `num_cpus` matched to the codec's
threading.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),     # "image/png" | "audio/wav" | ...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def detect_media_type(payload: bytes) -> str:
    """Magic-byte sniffing — the analyzer/type-detection analog
    (archive/pc_archive.c:108-110 magic dispatch)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:2] == b"\xff\xd8":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


class ImageDecodeStage:
    """Actor-pool stage: binary image → fixed-size float feature vector.

    ``fake=True`` (default in this container) produces a DETERMINISTIC
    feature from the payload bytes (sha256-seeded), preserving the full
    contract: output column ``features: list<float32>[dim]`` + pass-through
    metadata. With ``fake=False`` it raises NotImplementedError where the
    real decoder (PIL/libvips) would be called.
    """

    def __init__(self, dim: int = 64, fake: bool = True,
                 payload_col: str = "payload"):
        self.dim = dim
        self.fake = fake
        self.payload_col = payload_col
        # real deployment: codec/model handle loaded HERE, once per actor

    def _features(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "container; run with fake=True or install a decoder")
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        payloads = t[self.payload_col].to_pylist()
        feats = [self._features(p or b"") for p in payloads]
        types = [detect_media_type(p or b"") for p in payloads]
        out = t.append_column("features",
                              pa.array(feats, pa.list_(pa.float32())))
        return out.append_column("media_type_detected",
                                 pa.array(types, pa.string()))


class FrameSampleStage:
    """Actor-pool stage contract for video frame sampling (stubbed).

    Emits one row per sampled frame: (media_id, frame_idx, frame_payload).
    The fake samples deterministic byte slices so downstream plumbing
    (flat_map-style expansion, per-frame decode) is exercised for real.
    """

    def __init__(self, fps_divisor: int = 10, max_frames: int = 8,
                 payload_col: str = "payload", fake: bool = True):
        self.fps_divisor = fps_divisor
        self.max_frames = max_frames
        self.payload_col = payload_col
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        payloads = t[self.payload_col].to_pylist()
        out_id, out_frame, out_bytes = [], [], []
        for mid, p in zip(ids, payloads):
            if not self.fake:
                raise NotImplementedError("video decode not available here")
            p = p or b""
            n = min(self.max_frames, max(1, len(p) // 64))
            step = max(1, len(p) // max(n, 1))
            for f in range(n):
                out_id.append(int(mid))
                out_frame.append(f)
                out_bytes.append(p[f * step : f * step + 64])
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame_payload": pa.array(out_bytes, pa.binary()),
        })


def make_fake_media_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    payloads = []
    types = []
    for i in range(n):
        body = rng.integers(0, 256, int(rng.integers(200, 2000)),
                            dtype=np.uint8).tobytes()
        kind = i % 3
        if kind == 0:
            payloads.append(b"\x89PNG\r\n\x1a\n" + body)
        elif kind == 1:
            payloads.append(b"RIFF" + body[:4] + b"WAVE" + body)
        else:
            payloads.append(body[:4] + b"ftyp" + body)
        types.append(["image/png", "audio/wav", "video/mp4"][kind])
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
        "width": pa.array(np.full(n, 64, np.int32)),
        "height": pa.array(np.full(n, 64, np.int32)),
        "duration_ms": pa.array(np.full(n, 1000, np.int32)),
    })

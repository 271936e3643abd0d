"""Multimodal column stages: opaque binary payloads + typed metadata.

Images/audio/video are treated as opaque ``binary`` columns with typed
metadata (the reference's file-type tagging, utils/utils.h:276-340 +
archive/pc_arc_filter.c per-type filters, is the byte-level precedent).

The AUDIO path is REAL (PCM WAV struct parsing + numpy FFT features,
tested against planted sine frequencies). The IMAGE path is REAL for both
PNG (stdlib zlib + scanline unfiltering) and baseline JPEG (a from-scratch
T.81 Huffman+IDCT decoder, ``stages/jpeg.py``). The VIDEO path is REAL for
MJPEG-in-AVI (RIFF walk → per-frame JPEG decode via the same codec);
other video codecs (H.264/MP4 …) stay behind a deterministic fake — no
stdlib-feasible decoder exists — with all Ray-side plumbing (schema
contract, actor-pool stage shape, batch sizing, output layout) real and
tested.

Real-deployment note: decode stages are the canonical actor-pool case (codec
context per actor), with SMALL batch_size (large binary rows — see
memory-aware sizing in the brief) and `num_cpus` matched to the codec's
threading.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.jpeg import decode_jpeg, encode_jpeg

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),     # "image/png" | "audio/wav" | ...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def detect_media_type(payload: bytes) -> str:
    """MIME-style magic sniffing for the media stages. The reference's FULL
    type taxonomy (35 subtypes, utils/utils.h:276-324) lives in
    ``stages/filetype.py`` — this is just the four media container tags the
    decode stages dispatch on (archive/pc_archive.c:108-110 analog)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:2] == b"\xff\xd8":
        return "image/jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "video/avi"
    if payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def build_png(arr: np.ndarray) -> bytes:
    """Minimal 8-bit PNG encoder (filter 0 rows, stdlib zlib) for
    (H, W) grayscale or (H, W, 3|4) color arrays."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def parse_png(payload: bytes):
    """Real PNG decode (stdlib zlib + scanline unfiltering) → (H, W, C)
    uint8 array, or None for non-PNG / unsupported variants (non-8-bit,
    interlaced, palette). All five filter types (None/Sub/Up/Average/Paeth)
    are implemented; Sub/Up vectorized, Average/Paeth per-pixel (rare rows).
    """
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace or ctype_i not in _PNG_CHANNELS:
        return None
    c = _PNG_CHANNELS[ctype_i]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * c
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    rawm = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rawm[y, 0])
        row = rawm[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 1:  # Sub — per-channel cumsum (mod-256 at the end is
            # equivalent to per-step wrapping; int64 guards the running sum)
            rec = row.reshape(-1, c).astype(np.int64).cumsum(axis=0).ravel()
        elif ftype == 3:  # Average
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = row[i] + ((left + prev[i]) >> 1)
                rec[i] &= 0xFF
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for i in range(stride):
                a_ = rec[i - c] if i >= c else 0
                b_ = prev[i]
                c_ = prev[i - c] if i >= c else 0
                p = a_ + b_ - c_
                pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
                pr = a_ if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b_ if pb_ <= pc_ else c_)
                rec[i] = (row[i] + pr) & 0xFF
        else:
            return None
        out[y] = rec & 0xFF
    return out.reshape(h, w, c)


def png_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic real features from a decoded image: dims, global and
    per-channel mean/std, 8-bin luminance histogram — padded/truncated to
    ``dim`` float32 (the fixed-vector contract of the decode stage)."""
    h, w, c = img.shape
    f = [float(w), float(h), float(c),
         float(img.mean()), float(img.std())]
    for ch in range(c):
        f.append(float(img[:, :, ch].mean()))
        f.append(float(img[:, :, ch].std()))
    lum = img.mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=8, range=(0, 256))
    f.extend((hist / max(lum.size, 1)).tolist())
    out = np.zeros(dim, dtype=np.float32)
    out[:min(dim, len(f))] = np.asarray(f[:dim], dtype=np.float32)
    return out


class ImageDecodeStage:
    """Actor-pool stage: binary image → fixed-size float feature vector.

    PNG payloads are decoded FOR REAL (stdlib zlib + unfiltering,
    ``parse_png``) and baseline JPEG payloads are decoded FOR REAL
    (from-scratch T.81 Huffman+IDCT, ``stages/jpeg.py``); both yield
    genuine image statistics (``png_features``). For other formats (TIFF,
    progressive JPEG, …): ``fake=True`` (default) produces a DETERMINISTIC
    sha256-seeded feature preserving the full contract
    (``features: list<float32>[dim]``); ``fake=False`` raises
    NotImplementedError where an external decoder would be called.
    """

    def __init__(self, dim: int = 64, fake: bool = True,
                 payload_col: str = "payload"):
        self.dim = dim
        self.fake = fake
        self.payload_col = payload_col
        # real deployment: codec/model handle loaded HERE, once per actor

    def _features(self, payload: bytes) -> np.ndarray:
        img = parse_png(payload)
        if img is None and payload[:2] == b"\xff\xd8":
            img = decode_jpeg(payload)
        if img is not None:
            return png_features(img, self.dim)
        if not self.fake:
            raise NotImplementedError(
                "unsupported image format: decode requires an image library "
                "not present in this container; run with fake=True or "
                "install a decoder")
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


def build_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal 16-bit mono PCM WAV container around a sample array."""
    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def parse_wav(payload: bytes):
    """RIFF/WAVE chunk walk → (rate, mono float64 samples) or None.

    Pure struct parsing + np.frombuffer — PCM WAV needs no codec library,
    so this decode path is REAL (not a stub) even in this container.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, raw = 12, None, 1, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 8:
            _, channels, rate = struct.unpack("<HHI", body[:8])
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)
    if rate is None or raw is None or channels == 0:
        return None
    s = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2").astype(np.float64)
    if channels > 1:
        s = s[: s.size // channels * channels].reshape(-1, channels).mean(axis=1)
    return int(rate), s


class AudioFeatureStage:
    """Actor-pool stage: WAV payload → real signal features (NOT a stub).

    Per audio/wav row: sample count/rate, duration, RMS level,
    zero-crossing count and the dominant frequency (rfft argmax) — the
    feature-extraction shape of a speech-corpus pipeline, computed
    vectorized per file. Non-WAV rows pass through with nulls (route by
    ``media_type_detected`` upstream for mixed corpora).
    """

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col
        # real deployment: heavier codec/model state would load HERE

    def __call__(self, t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        payloads = t[self.payload_col].to_pylist()
        n = len(payloads)
        cols = {"sample_rate": np.full(n, -1, np.int64),
                "n_samples": np.full(n, -1, np.int64),
                "duration_ms_decoded": np.full(n, -1, np.int64),
                "rms": np.full(n, np.nan, np.float64),
                "zero_crossings": np.full(n, -1, np.int64),
                "dominant_freq_hz": np.full(n, np.nan, np.float64)}
        ok = np.zeros(n, dtype=bool)
        for i, p in enumerate(payloads):
            parsed = parse_wav(p or b"")
            if parsed is None:
                continue
            rate, s = parsed
            if s.size == 0 or rate <= 0:
                continue
            ok[i] = True
            cols["sample_rate"][i] = rate
            cols["n_samples"][i] = s.size
            cols["duration_ms_decoded"][i] = int(s.size * 1000 // rate)
            cols["rms"][i] = float(np.sqrt(np.mean(s * s)))
            cols["zero_crossings"][i] = int(
                np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1])))
            spec = np.abs(np.fft.rfft(s))
            if spec.size > 1:
                cols["dominant_freq_hz"][i] = float(
                    (1 + int(np.argmax(spec[1:]))) * rate / s.size)
        out = t.append_column("is_audio", pa.array(ok))
        for name, arr in cols.items():
            out = out.append_column(name, pa.array(arr))
        return out


def build_mp4(duration_ms: int, timescale: int = 1000,
              body: bytes = b"") -> bytes:
    """Minimal ISO-BMFF container: ftyp + moov(mvhd) (+ opaque mdat)."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I4s", 8 + len(payload), btype) + payload

    ftyp = box(b"ftyp", struct.pack(">4sI4s", b"isom", 512, b"mp41"))
    dur = duration_ms * timescale // 1000
    mvhd = box(b"mvhd", struct.pack(">BxxxIIII", 0, 0, 0, timescale, dur))
    return ftyp + box(b"moov", mvhd) + box(b"mdat", body)


def parse_mp4(payload: bytes):
    """ISO-BMFF box walk → (timescale, duration_ms) from moov/mvhd, or
    None. Pure struct parsing (like parse_wav) — real, no codec library."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def walk(buf: bytes, depth: int = 0):
        pos = 0
        while pos + 8 <= len(buf) and depth < 4:
            (sz,) = struct.unpack(">I", buf[pos:pos + 4])
            btype = buf[pos + 4:pos + 8]
            if sz < 8:
                return None
            body = buf[pos + 8:pos + sz]
            if btype == b"mvhd" and len(body) >= 20:
                ver = body[0]
                if ver == 0:
                    _, _, ts, dur = struct.unpack(">IIII", body[4:20])
                elif len(body) >= 28:
                    _, _, ts, dur = struct.unpack(">QQIQ", body[4:32]) \
                        if len(body) >= 32 else (0, 0, 0, 0)
                else:
                    return None
                return (ts, dur)
            if btype in (b"moov",):
                got = walk(body, depth + 1)
                if got:
                    return got
            pos += sz
        return None

    got = walk(payload)
    if not got or got[0] == 0:
        return None
    ts, dur = got
    return int(ts), int(dur * 1000 // ts)


def build_avi_mjpeg(frames_jpeg: list, fps: int = 10,
                    width: int = 32, height: int = 24) -> bytes:
    """Minimal-but-spec-shaped AVI RIFF writer for an MJPEG stream:
    LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER))
    followed by LIST movi with one '00dc' chunk per JPEG frame."""
    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) % 2 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    n = len(frames_jpeg)
    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0, n, 0, 1,
                       max((len(f) for f in frames_jpeg), default=0),
                       width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIi4H", b"vids", b"MJPG", 0, 0, 0, 0,
                       1, fps, 0, n, 0, 0, -1, 0, 0,
                       width & 0xFFFF, height & 0xFFFF)
    strf = struct.pack("<I2i2H6I", 40, width, height, 1, 24,
                       int.from_bytes(b"MJPG", "little"),
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames_jpeg))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def parse_avi_frames(payload: bytes, stream: bytes = b"00") -> list:
    """RIFF walk → the frame payloads of ONE video stream (``stream``dc /
    ``stream``db chunks inside LIST movi, stream 00 = the primary video
    stream by AVI convention). Restricting to a single stream keeps the
    temporal order meaningful — a multi-stream AVI interleaves chunks in
    file order, and mixing streams would corrupt every-Nth sampling. Pure
    struct parsing; for MJPEG each returned item is a complete JPEG byte
    string decodable by ``stages/jpeg.py``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        return []

    def chunks(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data = buf[pos + 8 : pos + 8 + sz]
            yield fourcc, data
            pos += 8 + sz + (sz % 2)

    def walk_movi(buf: bytes, frames: list):
        for cc, body in chunks(buf):
            if cc[:2] == stream and cc[2:4] in (b"dc", b"db"):
                frames.append(body)
            elif cc == b"LIST" and body[:4] == b"rec ":
                # interleaved muxers wrap frame chunks in 'rec ' groups
                walk_movi(body[4:], frames)

    frames: list = []
    # OpenDML files append further RIFF 'AVIX' segments after the first
    # RIFF extent, each with its own movi list — walk ALL top-level RIFFs
    for rcc, rbody in chunks(payload):
        if rcc != b"RIFF" or rbody[:4] not in (b"AVI ", b"AVIX"):
            continue
        for fourcc, data in chunks(rbody[4:]):
            if fourcc == b"LIST" and data[:4] == b"movi":
                walk_movi(data[4:], frames)
    return frames


class FrameSampleStage:
    """Actor-pool stage for video frame sampling.

    Emits one row per sampled frame: (media_id, frame_idx, frame_payload).
    MJPEG-in-AVI payloads are sampled FOR REAL: the RIFF container is
    walked (``parse_avi_frames``), every ``fps_divisor``-th '00dc' frame is
    emitted as its actual JPEG bytes — decodable downstream by the
    from-scratch T.81 codec (``stages/jpeg.py``), the same per-type filter
    routing the reference applies to AVI/MJPEG inputs
    (archive/pc_arc_filter.c:71-125, utils/utils.h TYPE_AVI/TYPE_MJPEG).
    Other codecs (H.264 in MP4, …) have no stdlib-feasible decoder:
    ``fake=True`` (default) samples deterministic byte slices so the
    plumbing is exercised; ``fake=False`` raises for them.
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
            p = p or b""
            # zero-length '00dc' chunks are standard drop-frame markers —
            # strip them BEFORE the codec gate so a real MJPEG stream with
            # dropped frames still takes the real path (frame indices then
            # number the retained frames, as a decoder's output would)
            frames = [f for f in parse_avi_frames(p) if f]
            # real path only for MJPEG streams: every retained frame must be
            # a JPEG (an AVI can carry raw DIB / H.264 chunks we can't decode)
            if frames and all(f[:2] == b"\xff\xd8" for f in frames):
                for f, idx in enumerate(
                        range(0, len(frames), max(1, self.fps_divisor))):
                    if f >= self.max_frames:
                        break
                    out_id.append(int(mid))
                    out_frame.append(idx)
                    out_bytes.append(frames[idx])
                continue
            if not self.fake:
                raise NotImplementedError(
                    "only MJPEG-AVI is decodable stdlib-side; this codec "
                    "needs an external decoder (run with fake=True)")
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


def make_fake_video_table(n: int, seed: int = 17) -> pa.Table:
    """Deterministic MJPEG-AVI corpus: every payload is a REAL AVI container
    whose '00dc' frames are REAL baseline JPEGs (from-scratch encoder) —
    the whole sample→decode chain runs without any codec library."""
    rng = np.random.default_rng(seed)
    payloads, n_frames = [], []
    for i in range(n):
        cnt = int(rng.integers(4, 13))
        frames = []
        for f in range(cnt):
            img = np.clip(np.add.outer(np.arange(24) * 3, np.arange(32) * 2)
                          [..., None] + np.array([(i * 7 + f * 11) % 128,
                                                  60, 100]),
                          0, 255).astype(np.uint8)
            frames.append(encode_jpeg(img, quality=85))
        payloads.append(build_avi_mjpeg(frames, fps=10, width=32, height=24))
        n_frames.append(cnt)
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["video/avi"] * n, pa.string()),
        "n_frames": pa.array(n_frames, pa.int32()),
    })


def make_fake_media_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic synthetic media table for tests. Row kinds cycle
    png / wav / mp4 / jpeg — every payload is genuinely decodable by the
    corresponding stage (the JPEG rows via the from-scratch T.81 codec)."""
    rng = np.random.default_rng(seed)
    payloads = []
    types = []
    rate = 8000
    for i in range(n):
        body = rng.integers(0, 256, int(rng.integers(200, 2000)),
                            dtype=np.uint8).tobytes()
        kind = i % 4
        if kind == 0:
            # REAL decodable PNG: deterministic gradient + noise image
            img = (np.add.outer(np.arange(24), np.arange(32))[..., None]
                   * np.array([3, 5, 7]) % 256
                   + rng.integers(0, 32, (24, 32, 3))).astype(np.uint8)
            payloads.append(build_png(img))
        elif kind == 1:
            # REAL playable WAV: sine at a per-row frequency (decodable by
            # AudioFeatureStage without any codec library)
            freq = 200.0 + 40.0 * (i % 10)
            tgrid = np.arange(int(rate * 0.2)) / rate
            samples = (np.sin(2 * np.pi * freq * tgrid) * 12000).astype(np.int16)
            payloads.append(build_wav(samples, rate))
        elif kind == 2:
            # REAL parseable MP4 container: known duration, opaque mdat
            payloads.append(build_mp4(500 + 100 * (i % 7), body=body))
        else:
            # REAL decodable baseline JPEG: smooth gradient (4:4:4 and
            # 4:2:0 alternating), dims NOT multiples of 8
            img = np.clip(np.add.outer(np.arange(21) * 4, np.arange(29) * 3)
                          [..., None] + np.array([i % 64, 40, 90]),
                          0, 255).astype(np.uint8)
            payloads.append(encode_jpeg(img, quality=85,
                                        subsample=bool(i % 8 == 7)))
        types.append(["image/png", "audio/wav", "video/mp4",
                      "image/jpeg"][kind])
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
        "width": pa.array(np.full(n, 64, np.int32)),
        "height": pa.array(np.full(n, 64, np.int32)),
        "duration_ms": pa.array(np.full(n, 1000, np.int32)),
    })

"""Multimodal stages: REAL WAV decode + feature extraction, typed stubs."""

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.multimodal import (AudioFeatureStage,
                                             FrameSampleStage,
                                             ImageDecodeStage, build_mp4,
                                             build_png, build_wav,
                                             detect_media_type,
                                             make_fake_media_table, parse_mp4,
                                             parse_png, parse_wav,
                                             png_features)


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(5)
    samples = rng.integers(-30000, 30000, 4000, dtype=np.int16)
    payload = build_wav(samples, 16000)
    assert detect_media_type(payload) == "audio/wav"
    rate, got = parse_wav(payload)
    assert rate == 16000
    np.testing.assert_array_equal(got, samples.astype(np.float64))


def test_parse_wav_rejects_garbage():
    assert parse_wav(b"") is None
    assert parse_wav(b"RIFFxxxxWAVE") is None
    assert parse_wav(b"\x89PNG\r\n\x1a\n" + b"x" * 100) is None


def test_audio_features_recover_planted_frequency():
    """The dominant-frequency feature recovers each planted sine within one
    FFT bin; durations and sample counts are exact; non-WAV rows are
    flagged is_audio=False with null-ish features."""
    tab = make_fake_media_table(30)
    out = AudioFeatureStage()(tab)
    ok = out["is_audio"].to_numpy(zero_copy_only=False)
    kinds = np.arange(30) % 4
    np.testing.assert_array_equal(ok, kinds == 1)
    rate = 8000
    n_samp = int(rate * 0.2)
    for i in np.flatnonzero(ok):
        want_freq = 200.0 + 40.0 * (i % 10)
        got = out["dominant_freq_hz"][int(i)].as_py()
        assert abs(got - want_freq) <= rate / n_samp + 1e-9, (i, got, want_freq)
        assert out["n_samples"][int(i)].as_py() == n_samp
        assert out["duration_ms_decoded"][int(i)].as_py() == 200
        assert out["zero_crossings"][int(i)].as_py() > 0
        assert out["rms"][int(i)].as_py() > 1000


def test_png_roundtrip_exact():
    rng = np.random.default_rng(13)
    for shape in ((17, 23), (16, 16, 3), (8, 9, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = parse_png(build_png(img))
        want = img if img.ndim == 3 else img[:, :, None]
        np.testing.assert_array_equal(got, want)


def test_png_all_filter_types():
    """Hand-encode each scanline filter (None/Sub/Up/Average/Paeth) and
    check the decoder reconstructs the original exactly."""
    import struct
    import zlib

    from pcompress_ray.stages.multimodal import _PNG_SIG, _png_chunk

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    h, w, c = img.shape

    def flt(y, ftype):
        row = img[y].astype(np.int32).ravel()
        prev = img[y - 1].astype(np.int32).ravel() if y else np.zeros(w * c, np.int32)
        out = np.empty(w * c, np.int32)
        for i in range(w * c):
            a = int(img[y].ravel()[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
            out[i] = (row[i] - pred) & 0xFF
        return bytes([ftype]) + out.astype(np.uint8).tobytes()

    raw = b"".join(flt(y, y % 5) for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    np.testing.assert_array_equal(parse_png(payload), img)


def test_image_stage_real_png_features():
    """PNG rows get REAL image statistics (dims + channel means), not the
    sha-seeded fake."""
    tab = make_fake_media_table(8)
    out = ImageDecodeStage(dim=32)(tab)
    feats = np.asarray(out["features"].to_pylist(), dtype=np.float32)
    for i in range(0, 8, 4):  # PNG rows
        img = parse_png(tab["payload"][i].as_py())
        assert img is not None and img.shape == (24, 32, 3)
        np.testing.assert_allclose(feats[i], png_features(img, 32))
        assert feats[i][0] == 32 and feats[i][1] == 24 and feats[i][2] == 3
        assert abs(feats[i][3] - img.mean()) < 1e-3


def test_image_decode_stub_contract():
    tab = make_fake_media_table(9)
    out = ImageDecodeStage(dim=16)(tab)
    assert out["features"].type == pa.list_(pa.float32())
    feats = out["features"].to_pylist()
    assert all(len(f) == 16 for f in feats)
    # deterministic: same payload -> same fake features
    out2 = ImageDecodeStage(dim=16)(tab)
    assert out["features"].to_pylist() == out2["features"].to_pylist()
    det = out["media_type_detected"].to_pylist()
    assert det[0] == "image/png" and det[1] == "audio/wav" and det[2] == "video/mp4"
    assert det[3] == "image/jpeg"


def test_mp4_metadata_roundtrip():
    p = build_mp4(1234, timescale=600, body=b"x" * 100)
    assert detect_media_type(p) == "video/mp4"
    ts, dur_ms = parse_mp4(p)
    assert ts == 600
    assert abs(dur_ms - 1234) <= 2  # timescale quantization
    assert parse_mp4(b"garbage" * 10) is None
    # the media table's mp4 rows are genuinely parseable
    tab = make_fake_media_table(12)
    for i in (2, 6, 10):
        got = parse_mp4(tab["payload"][i].as_py())
        assert got is not None and got[1] == 500 + 100 * (i % 7)


def test_frame_sample_stub_contract():
    tab = make_fake_media_table(6)
    out = FrameSampleStage(max_frames=4)(tab)
    assert out.column_names == ["media_id", "frame_idx", "frame_payload"]
    assert len(out) > 0
    assert max(out["frame_idx"].to_pylist()) <= 3


def test_avi_mjpeg_roundtrip_and_real_sampling():
    """AVI writer → parser round-trips frame bytes exactly; FrameSampleStage
    in fake=False mode emits REAL JPEG frames (every 2nd, capped) that the
    from-scratch codec decodes to the planted gradient."""
    import numpy as np

    from pcompress_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from pcompress_ray.stages.multimodal import (FrameSampleStage,
                                                 build_avi_mjpeg,
                                                 parse_avi_frames)

    frames = []
    for f in range(7):
        img = np.clip(np.add.outer(np.arange(24) * 3, np.arange(32) * 2)
                      [..., None] + np.array([f * 20, 60, 100]),
                      0, 255).astype(np.uint8)
        frames.append(encode_jpeg(img, quality=85))
    avi = build_avi_mjpeg(frames, fps=10, width=32, height=24)
    got = parse_avi_frames(avi)
    assert got == frames  # byte-exact container round-trip
    assert parse_avi_frames(b"RIFF\0\0\0\0WAVE") == []
    assert parse_avi_frames(b"junk") == []

    import pyarrow as pa
    tab = pa.table({"media_id": pa.array([5], pa.int64()),
                    "payload": pa.array([avi], pa.binary())})
    out = FrameSampleStage(fps_divisor=2, max_frames=3, fake=False)(tab)
    assert out["frame_idx"].to_pylist() == [0, 2, 4]  # every 2nd, capped 3
    for row, fidx in enumerate(out["frame_idx"].to_pylist()):
        img = decode_jpeg(out["frame_payload"][row].as_py())
        assert img.shape == (24, 32, 3)
        ref = decode_jpeg(frames[fidx])
        assert (img == ref).all()  # the sampled bytes ARE the frame


def test_frame_sample_fake_false_rejects_non_avi():
    import pytest

    tab = make_fake_media_table(3)  # png/wav/mp4 rows — none AVI
    with pytest.raises(NotImplementedError):
        FrameSampleStage(fake=False)(tab)


def test_video_frames_query(ray_session):
    """End-to-end: 40 MJPEG-AVI videos → sampled frames decoded; counts
    match the planted per-video frame counts (every 2nd frame, max 4)."""
    import pcompress_ray

    pcompress_ray.register_for_ray()
    import __ray_entry__ as e

    from pcompress_ray.stages.multimodal import make_fake_video_table

    out = e.queries()["video_frames"]("/root/testdata/sf0.001").to_pandas()
    want = make_fake_video_table(40).to_pandas()
    got_counts = out.groupby("media_id").size()
    for mid, cnt in zip(want["media_id"], want["n_frames"]):
        assert got_counts[mid] == min(4, (int(cnt) + 1) // 2), mid
    assert (out["width"] == 32).all() and (out["height"] == 24).all()
    assert out["mean_luma_e3"].between(40_000, 220_000).all()


def test_avi_opendml_rec_lists_and_stream_isolation():
    """Container-walk generality: frames inside LIST 'rec ' groups
    (interleaved muxers) and OpenDML 'AVIX' continuation RIFF segments are
    collected in file order — but ONLY the requested stream's chunks, so a
    secondary video stream ('01dc') never corrupts every-Nth sampling."""
    import struct

    from pcompress_ray.stages.jpeg import encode_jpeg
    from pcompress_ray.stages.multimodal import parse_avi_frames

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) % 2 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    imgs = [np.full((8, 8, 3), 40 * (i + 1), np.uint8) for i in range(4)]
    f = [encode_jpeg(im, quality=85) for im in imgs]
    movi1 = lst(b"movi", chunk(b"00dc", f[0])
                + lst(b"rec ", chunk(b"00dc", f[1]))
                + chunk(b"01dc", f[2]))
    movi2 = lst(b"movi", chunk(b"00db", f[3]))
    avi = chunk(b"RIFF", b"AVI " + movi1) + chunk(b"RIFF", b"AVIX" + movi2)
    assert parse_avi_frames(avi) == [f[0], f[1], f[3]]  # stream 00 only
    assert parse_avi_frames(avi, stream=b"01") == [f[2]]
    # non-frame chunks ('idx1', 'xxtx' text stream) are ignored
    movi3 = lst(b"movi", chunk(b"00dc", f[0]) + chunk(b"02tx", b"subs"))
    avi3 = chunk(b"RIFF", b"AVI " + movi3 + chunk(b"idx1", b"\0" * 16))
    assert parse_avi_frames(avi3) == [f[0]]


def test_frame_sample_tolerates_drop_frames():
    """Zero-length '00dc' chunks (drop-frame markers) don't reroute a real
    MJPEG stream to the fake path: empty frames are stripped, the retained
    JPEG frames sample normally."""
    import struct

    import pyarrow as pa

    from pcompress_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from pcompress_ray.stages.multimodal import FrameSampleStage

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) % 2 else b"")

    f = [encode_jpeg(np.full((8, 8, 3), 60 * (i + 1), np.uint8), quality=85)
         for i in range(3)]
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", f[0])
                 + chunk(b"00dc", b"")        # drop frame
                 + chunk(b"00dc", f[1]) + chunk(b"00dc", f[2]))
    avi = chunk(b"RIFF", b"AVI " + movi)
    tab = pa.table({"media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([avi], pa.binary())})
    out = FrameSampleStage(fps_divisor=1, max_frames=8, fake=False)(tab)
    assert out["frame_idx"].to_pylist() == [0, 1, 2]
    got = [decode_jpeg(b.as_py()) for b in out["frame_payload"]]
    assert [g.mean() for g in got] == \
        [decode_jpeg(x).mean() for x in f]


def test_frame_sample_rejects_non_mjpeg_avi():
    """An AVI whose frame chunks are NOT JPEGs (raw DIB / H.264) must not
    take the real path: fake=False raises, fake=True falls back to the
    deterministic byte-slice plumbing."""
    import pytest

    from pcompress_ray.stages.multimodal import (FrameSampleStage,
                                                 build_avi_mjpeg,
                                                 parse_avi_frames)

    raw_frames = [b"\x00\x01rawdib" * 20, b"\x00\x02rawdib" * 20]
    avi = build_avi_mjpeg(raw_frames, fps=10, width=8, height=8)
    assert parse_avi_frames(avi) == raw_frames  # container walk still works
    tab = pa.table({"media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([avi], pa.binary())})
    with pytest.raises(NotImplementedError):
        FrameSampleStage(fake=False)(tab)
    out = FrameSampleStage(fake=True, max_frames=2)(tab)
    assert len(out) > 0  # plumbing path, not decoded frames

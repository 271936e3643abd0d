"""Multimodal stages: REAL WAV decode + feature extraction, typed stubs."""

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.multimodal import (AudioFeatureStage,
                                             FrameSampleStage,
                                             ImageDecodeStage, build_wav,
                                             detect_media_type,
                                             make_fake_media_table, parse_wav)


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
    kinds = np.arange(30) % 3
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


def test_frame_sample_stub_contract():
    tab = make_fake_media_table(6)
    out = FrameSampleStage(max_frames=4)(tab)
    assert out.column_names == ["media_id", "frame_idx", "frame_payload"]
    assert len(out) > 0
    assert max(out["frame_idx"].to_pylist()) <= 3

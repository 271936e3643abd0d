"""Baseline JPEG codec (stages/jpeg.py): from-scratch T.81 round-trips.

The reference routes JPEG payloads through a type-specific filter slot
(archive/pc_arc_filter.c:71-125); here the type-specific stage computes
REAL image features from a real decode — these tests pin the codec with
planted images (no codec library exists in this container to compare
against, so the oracle is encode→decode PSNR plus structural invariants).
"""

import numpy as np
import pytest

from pcompress_ray.stages.jpeg import decode_jpeg, encode_jpeg
from pcompress_ray.stages.multimodal import (ImageDecodeStage,
                                             detect_media_type,
                                             make_fake_media_table,
                                             png_features)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse else np.inf


def _planted(h, w, noise=0.0, seed=3):
    rng = np.random.default_rng(seed)
    img = (np.add.outer(np.arange(h) * 3.0, np.arange(w) * 2.0)[..., None]
           + np.array([0.0, 40.0, 80.0]))
    if noise:
        img = img + rng.normal(0, noise, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_color_444_and_420():
    """Odd (non-multiple-of-8) dims, both chroma layouts: decode must
    return the exact input shape and a high-fidelity reconstruction."""
    img = _planted(41, 53, noise=3.0)
    for sub in (False, True):
        enc = encode_jpeg(img, quality=90, subsample=sub)
        assert detect_media_type(enc) == "image/jpeg"
        dec = decode_jpeg(enc)
        assert dec is not None and dec.shape == img.shape
        assert _psnr(img, dec) > 30.0, sub


def test_jpeg_roundtrip_grayscale():
    g = np.clip(np.add.outer(np.arange(24) * 5, np.arange(32) * 3) % 256,
                0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert dec is not None and dec.shape == (24, 32, 3)
    # gray replicated across channels
    np.testing.assert_array_equal(dec[:, :, 0], dec[:, :, 1])
    assert _psnr(np.repeat(g[:, :, None], 3, 2), dec) > 35.0


def test_jpeg_flat_image_near_exact():
    """A flat field survives quantization exactly (DC-only blocks)."""
    img = np.full((16, 24, 3), 77, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=85))
    assert dec is not None
    assert np.abs(dec.astype(int) - 77).max() <= 2


def test_jpeg_restart_markers_roundtrip_identical():
    """DRI/RSTn resync path: decode with restart markers must be
    bit-identical to the same stream without them."""
    img = _planted(48, 80, noise=2.0, seed=9)
    for sub in (False, True):
        base = decode_jpeg(encode_jpeg(img, 88, subsample=sub))
        for dri in (1, 3):
            enc = encode_jpeg(img, 88, subsample=sub, restart_interval=dri)
            assert b"\xff\xdd" in enc[:1000]  # DRI segment present
            np.testing.assert_array_equal(decode_jpeg(enc), base)


def test_jpeg_rejects_garbage_and_progressive():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8" + bytes(200)) is None
    # flip SOF0 -> SOF2 (progressive): decoder must decline, not crash
    enc = bytearray(encode_jpeg(_planted(16, 16), 85))
    sof = enc.find(b"\xff\xc0")
    assert sof >= 0
    enc[sof + 1] = 0xC2
    assert decode_jpeg(bytes(enc)) is None


def test_jpeg_encode_deterministic():
    img = _planted(21, 29, noise=1.0, seed=5)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


def test_image_stage_real_jpeg_features():
    """JPEG rows in the media table get REAL decoded statistics (dims and
    channel means from the actual pixels), not the sha-seeded fake."""
    tab = make_fake_media_table(16)
    out = ImageDecodeStage(dim=32)(tab)
    feats = np.asarray(out["features"].to_pylist(), dtype=np.float32)
    jpeg_rows = [i for i in range(16) if i % 4 == 3]
    assert jpeg_rows
    for i in jpeg_rows:
        payload = tab["payload"][i].as_py()
        img = decode_jpeg(payload)
        assert img is not None and img.shape == (21, 29, 3)
        np.testing.assert_allclose(feats[i], png_features(img, 32))
        assert feats[i][0] == 29 and feats[i][1] == 21 and feats[i][2] == 3
        # decoded mean tracks the planted gradient's mean (not a hash fake)
        assert abs(feats[i][3] - img.mean()) < 1e-3


def test_image_stage_strict_mode_accepts_jpeg():
    """fake=False no longer raises for JPEG (real decoder); still raises
    for formats with no stdlib decode path."""
    img = _planted(9, 9)
    stage = ImageDecodeStage(dim=8, fake=False)
    f = stage._features(encode_jpeg(img, 85))
    assert f.shape == (8,) and f[0] == 9.0
    with pytest.raises(NotImplementedError):
        stage._features(b"II*\x00not-an-image")

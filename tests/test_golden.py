"""Golden regression gate (reference: test/backward_compat/ +
run_backward_compat.sh — frozen archives + SHA-256 of decoded payloads).

A consistent semantic drift in CDC constants, tokenizer/shingle hashing,
or the archive wire format passes every relative test (engine == its own
recomputed oracle) — these pins catch it. Regenerate DELIBERATELY with
`python tools/make_golden.py` and commit the new fixtures alongside the
semantic change that caused them.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.golden_common import (chunk_digest, cluster_table,  # noqa: E402
                                 golden_pages, restore_digest,
                                 signature_digest)

GOLDEN_DIR = Path(__file__).parent / "golden"


def _golden() -> dict:
    with open(GOLDEN_DIR / "golden.json") as f:
        return json.load(f)


def test_chunk_digest_matches_golden():
    assert chunk_digest(golden_pages()) == _golden()["chunk_digest"]


def test_signature_digest_matches_golden():
    assert signature_digest(golden_pages()) == _golden()["signature_digest"]


def test_chunk_digest_catches_mutated_cdc_constant(monkeypatch):
    """Sensitivity proof: perturbing one entry of the CDC rolling-hash
    table (≙ a mutated RAB_POLYNOMIAL/FP_POLY constant) must change the
    digest — i.e. the golden pin actually guards the constants."""
    from pcompress_ray.stages import cdc

    mutated = cdc._IR_TAB.copy()
    mutated[ord("e")] ^= np.uint64(1)  # a byte that actually occurs in text
    monkeypatch.setattr(cdc, "_IR_TAB", mutated)
    assert chunk_digest(golden_pages()) != _golden()["chunk_digest"]


def test_cluster_assignments_match_golden(ray_session):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    got = cluster_table(golden_pages())
    want = pq.read_table(GOLDEN_DIR / "clusters.parquet").to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_archive_restore_digest_matches_golden(ray_session, tmp_path):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    got = restore_digest(golden_pages(), str(tmp_path / "arch"))
    assert got == _golden()["restore_digest"]


# --------------------------------------------------------------------------
# multimodal golden pins (driver-gate rows-only forever → drift here would
# otherwise only surface via planted fixtures)
# --------------------------------------------------------------------------

def test_filetype_digest_matches_golden():
    from tools.golden_common import filetype_digest

    assert filetype_digest() == _golden()["filetype_digest"]


def test_image_digest_matches_golden():
    from tools.golden_common import image_digest

    assert image_digest() == _golden()["image_digest"]


def test_video_digest_matches_golden():
    from tools.golden_common import video_digest

    assert video_digest() == _golden()["video_digest"]


def test_audio_digest_matches_golden():
    from tools.golden_common import audio_digest

    assert audio_digest() == _golden()["audio_digest"]


def test_video_digest_catches_mutated_quant_table(monkeypatch):
    """Sensitivity proof: perturbing one JPEG quantization entry (≙ a
    codec-table drift) must change the frame digest — the pin actually
    guards the T.81 tables, not just the plumbing."""
    from pcompress_ray.stages import jpeg

    mutated = jpeg._QT_LUMA.copy()
    # big enough to survive the quality rescale's integer division
    mutated[0] += 40
    monkeypatch.setattr(jpeg, "_QT_LUMA", mutated)
    from tools.golden_common import video_digest

    assert video_digest() != _golden()["video_digest"]


def test_filetype_digest_catches_mutated_magic(monkeypatch):
    """Dropping one magic-byte rule must change the type digest."""
    from pcompress_ray.stages import filetype

    monkeypatch.setattr(filetype, "_EXTRA_MAGICS",
                        filetype._EXTRA_MAGICS[1:])
    from tools.golden_common import filetype_digest

    assert filetype_digest() != _golden()["filetype_digest"]

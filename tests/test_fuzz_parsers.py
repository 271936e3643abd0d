"""Malformed-input fuzz pass for the binary parsers (reference analog:
the libFuzzer/AFL harnesses in test/fuzz/, docs/TESTING.md:210-258).

Strategy: start from a VALID artifact produced by the matching builder,
then mutate bytes / truncate / splice via hypothesis. The contract under
corruption is uniform across parsers:

- never hang (every example bounded by the hypothesis deadline),
- never allocate unboundedly (JPEG dimension cap, WARC negative-length
  guard),
- fail only through the declared channel: ValueError (strict parsers),
  None (decode_jpeg), [] / short list (lenient AVI walk), or a clean
  codec error (decompress_chunk).

Pure in-process — no Ray.
"""

from __future__ import annotations

import lzma
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pcompress_ray.sources.warc import parse_warc_bytes, warc_record_bytes
from pcompress_ray.stages.compress import compress_chunk, decompress_chunk
from pcompress_ray.stages.jpeg import decode_jpeg, encode_jpeg
from pcompress_ray.stages.multimodal import (
    build_avi_mjpeg,
    parse_avi_frames,
    parse_mp4,
    parse_png,
    parse_wav,
)

# --------------------------------------------------------------------------
# shared mutation machinery
# --------------------------------------------------------------------------


def _mutate(base: bytes, ops) -> bytes:
    """Apply (kind, pos_frac, val) mutation ops to a copy of ``base``."""
    buf = bytearray(base)
    for kind, frac, val in ops:
        if not buf:
            break
        pos = min(int(frac * len(buf)), len(buf) - 1)
        if kind == 0:      # overwrite one byte
            buf[pos] = val
        elif kind == 1:    # truncate
            del buf[pos:]
        elif kind == 2:    # insert a byte
            buf.insert(pos, val)
        else:              # splice: duplicate a 16-byte window
            buf[pos:pos] = bytes(buf[pos:pos + 16])
    return bytes(buf)


mutations = st.lists(
    st.tuples(st.integers(0, 3), st.floats(0, 1), st.integers(0, 255)),
    min_size=1, max_size=8)


# --------------------------------------------------------------------------
# WARC
# --------------------------------------------------------------------------

_WARC_BASE = b"".join(
    warc_record_bytes(f"https://ex.org/{i}", 1_700_000_000 + i,
                      b"<html><body>" + bytes(60 + i) + b"</body></html>")
    for i in range(4))


@settings(max_examples=200, deadline=2000)
@given(ops=mutations)
def test_warc_fuzz_strict_raises_or_parses(ops):
    blob = _mutate(_WARC_BASE, ops)
    try:
        recs = list(parse_warc_bytes(blob, strict=True))
        assert all(isinstance(r, tuple) and len(r) == 3 for r in recs)
    except ValueError:
        pass                              # the one declared failure mode


@settings(max_examples=200, deadline=2000)
@given(ops=mutations)
def test_warc_fuzz_lenient_never_raises(ops):
    blob = _mutate(_WARC_BASE, ops)
    recs = list(parse_warc_bytes(blob, strict=False))
    assert len(recs) <= 8                 # can't invent records from noise


def test_warc_lying_content_length():
    rec = bytearray(warc_record_bytes("https://ex.org/x", 1_700_000_000,
                                      b"payload-bytes"))
    # inflate the declared length far past the blob end
    i = rec.lower().find(b"content-length:")
    j = rec.find(b"\r\n", i)
    lying = bytes(rec[:i]) + b"Content-Length: 999999999" + bytes(rec[j:])
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(lying, strict=True))
    assert list(parse_warc_bytes(lying, strict=False)) == []


def test_warc_negative_content_length_is_fatal_not_a_loop():
    rec = bytearray(warc_record_bytes("https://ex.org/x", 1_700_000_000,
                                      b"payload-bytes"))
    i = rec.lower().find(b"content-length:")
    j = rec.find(b"\r\n", i)
    neg = bytes(rec[:i]) + b"Content-Length: -64" + bytes(rec[j:])
    with pytest.raises(ValueError, match="negative"):
        list(parse_warc_bytes(neg, strict=True))


# --------------------------------------------------------------------------
# JPEG
# --------------------------------------------------------------------------

def _base_jpeg() -> bytes:
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
    return encode_jpeg(img, quality=85, subsample="420", restart_interval=2)


_JPEG_BASE = _base_jpeg()


@settings(max_examples=200, deadline=3000)
@given(ops=mutations)
def test_jpeg_fuzz_returns_array_or_none(ops):
    out = decode_jpeg(_mutate(_JPEG_BASE, ops))
    if out is not None:
        assert out.dtype == np.uint8 and out.ndim == 3


def test_jpeg_huge_dimension_header_rejected_before_allocation():
    """A corrupt SOF claiming 65535x65535 must fail the dimension cap, not
    attempt a multi-GB allocation / million-MCU scan."""
    buf = bytearray(_JPEG_BASE)
    sof = buf.find(b"\xFF\xC0")
    assert sof > 0
    # SOF payload: len(2) precision(1) height(2) width(2)
    buf[sof + 5:sof + 9] = b"\xFF\xFF\xFF\xFF"
    assert decode_jpeg(bytes(buf)) is None


def test_jpeg_truncation_ladder():
    """Every truncation point decodes to an array or None — no hangs, no
    uncaught errors (sweeps all header/entropy boundaries)."""
    for cut in range(0, len(_JPEG_BASE), 7):
        out = decode_jpeg(_JPEG_BASE[:cut])
        assert out is None or out.ndim == 3


# --------------------------------------------------------------------------
# AVI / MP4 / PNG / WAV container walks
# --------------------------------------------------------------------------

_AVI_BASE = build_avi_mjpeg([_JPEG_BASE] * 3, fps=10)


@settings(max_examples=200, deadline=2000)
@given(ops=mutations)
def test_avi_fuzz_returns_list(ops):
    frames = parse_avi_frames(_mutate(_AVI_BASE, ops))
    assert isinstance(frames, list) and len(frames) <= 16


@settings(max_examples=150, deadline=2000)
@given(ops=mutations)
def test_png_wav_mp4_fuzz_parse_or_clean_error(ops):
    from pcompress_ray.stages.multimodal import build_mp4, build_png, build_wav

    rng = np.random.default_rng(5)
    bases = (
        build_png(rng.integers(0, 255, (9, 11, 3), dtype=np.uint8)),
        build_wav((rng.standard_normal(256) * 1000).astype(np.int16), 8000),
        build_mp4(4000),
    )
    import struct

    for parse, base in zip((parse_png, parse_wav, parse_mp4), bases):
        try:
            parse(_mutate(base, ops))
        except (ValueError, zlib.error, struct.error):
            pass


# --------------------------------------------------------------------------
# archive codec payloads (restore-path kernel)
# --------------------------------------------------------------------------

@settings(max_examples=200, deadline=2000)
@given(ops=mutations, codec=st.sampled_from(["zlib", "lzma", "bz2"]))
def test_decompress_fuzz_clean_error_or_roundtrip(ops, codec):
    """Corrupted stored chunks must either decompress to SOME bytes (the
    sha check downstream catches wrong content) or raise the codec's
    error type — never hang, never return a non-bytes object."""
    import bz2

    payload = bytes(range(256)) * 8
    stored = compress_chunk(payload, codec)
    blob = _mutate(stored, ops)
    try:
        out = decompress_chunk(blob, codec)
        assert isinstance(out, (bytes, bytearray))
    except (ValueError, EOFError, zlib.error, lzma.LZMAError, OSError):
        pass


def test_warc_lenient_resyncs_past_one_bad_record():
    """One corrupt record costs one record, not the rest of the member."""
    recs = [warc_record_bytes(f"https://ex.org/{i}", 1_700_000_000 + i,
                              b"<html>" + bytes([65 + i]) * 40 + b"</html>")
            for i in range(12)]
    # corrupt record 3's Content-Length header value
    bad = bytearray(recs[3])
    i = bad.lower().find(b"content-length:")
    j = bad.find(b"\r\n", i)
    for mutant in (b"Content-Length: oops", b"Content-Length: -7",
                   b"Content-Length: 999999999"):
        blob = b"".join(recs[:3]) + bytes(bad[:i]) + mutant \
            + bytes(bad[j:]) + b"".join(recs[4:])
        got = list(parse_warc_bytes(blob, strict=False))
        assert [u for u, _, _ in got] == \
            [f"https://ex.org/{k}" for k in range(12) if k != 3], mutant
        with pytest.raises(ValueError):
            list(parse_warc_bytes(blob, strict=True))

"""Delta2 / LZP preprocessing filters (reference level>4 chain,
pcompress.c:3698-3741; filters/delta2/delta2.c, filters/lzp/lzp.c)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pcompress_ray.stages.compress import (compress_chunk, decompress_chunk,
                                           select_and_compress)
from pcompress_ray.stages.filters import (delta2_decode, delta2_encode,
                                          lzp_decode, lzp_encode)


def _table_bytes() -> bytes:
    """Noise + two planted strided arithmetic tables (stride 4 and 2)."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, 700, dtype=np.uint8).tobytes()
    t4 = (1000 + 7 * np.arange(900, dtype=np.uint32)).tobytes()
    t2 = ((np.arange(400, dtype=np.uint16) * 3 + 9)).astype(np.uint16).tobytes()
    return noise + t4 + noise + t2


def test_delta2_planted_tables_roundtrip_and_shrink():
    data = _table_bytes()
    enc = delta2_encode(data)
    assert enc is not None and len(enc) < len(data) // 2
    assert delta2_decode(enc) == data


def test_delta2_no_gain_on_noise():
    rng = np.random.default_rng(8)
    assert delta2_encode(rng.integers(0, 256, 4000,
                                      dtype=np.uint8).tobytes()) is None


def test_delta2_wraparound_and_const():
    # descending sequence = wrapping unsigned delta; constant bytes too
    desc = (np.arange(500, 0, -1, dtype=np.uint32) * 11).tobytes()
    e = delta2_encode(desc)
    assert e is not None and delta2_decode(e) == desc
    const = b"\x9c" * 6000
    e2 = delta2_encode(const)
    assert e2 is not None and delta2_decode(e2) == const


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=3000),
       st.integers(min_value=0, max_value=3))
def test_delta2_property_roundtrip(blob, mode):
    # mix arbitrary bytes with table spans so both paths exercise
    if mode:
        tab = (np.arange(200 * mode, dtype=np.uint32) * mode).tobytes()
        blob = blob[: len(blob) // 2] + tab + blob[len(blob) // 2 :]
    enc = delta2_encode(blob)
    if enc is not None:
        assert delta2_decode(enc) == blob


def test_lzp_roundtrip_and_escape_handling():
    txt = (b"the quick brown fox jumps over the lazy dog. " * 80
           + b"\xf2\xf2 escape bytes \xf2" + b"unique tail 123")
    enc = lzp_encode(txt)
    assert enc is not None and len(enc) < len(txt) // 2
    assert lzp_decode(enc) == txt


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=0, max_size=1500))
def test_lzp_property_roundtrip(s):
    blob = (s * 3).encode()  # repetition → matches likely
    enc = lzp_encode(blob)
    if enc is not None:
        assert lzp_decode(enc) == blob


def test_select_and_compress_filter_gating():
    data = _table_bytes()  # binary by the 30% rule (random high bytes)
    codec, payload = select_and_compress(data, "zlib", "zlib",
                                         filters=("delta2",))
    assert codec == "delta2+zlib"
    assert decompress_chunk(payload, codec) == data
    # plain zlib must be strictly worse for the filtered pick to win
    assert len(payload) < len(compress_chunk(data, "zlib"))
    # text chunk: delta2 not attempted (reference gates it off text)
    t = b"plain ascii text, nothing strided about it. " * 40
    codec_t, payload_t = select_and_compress(t, "zlib", "zlib",
                                             filters=("delta2",))
    assert codec_t == "zlib"
    # lzp on text when enabled and it wins
    codec_l, payload_l = select_and_compress(t, "none", "zlib",
                                             filters=("lzp",))
    assert codec_l == "lzp+none"
    assert decompress_chunk(payload_l, codec_l) == t


def test_compress_chunk_filter_no_gain_raises():
    rng = np.random.default_rng(9)
    with pytest.raises(ValueError):
        compress_chunk(rng.integers(0, 256, 4000,
                                    dtype=np.uint8).tobytes(), "delta2+zlib")

"""Similarity-delta encoding: kernel round-trips + the cluster-member
pipeline stage (reference DELTA refs / bspatch analog,
rabin/rabin_dedup.c:1300-1346, :1678-1708)."""

from __future__ import annotations

import numpy as np
import pytest

from pcompress_ray.stages.delta import delta_decode, delta_encode


def _rand_text(rng, n):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "kappa"]
    out = []
    size = 0
    while size < n:
        w = words[int(rng.integers(len(words)))]
        out.append(w)
        size += len(w) + 1
    return (" ".join(out)).encode()


def test_delta_roundtrip_always():
    rng = np.random.default_rng(3)
    shared = _rand_text(rng, 6000)
    cases = [
        (b"", b""),
        (b"", b"target only"),
        (b"base only", b""),
        (b"identical " * 500, b"identical " * 500),
        (_rand_text(rng, 3000), _rand_text(rng, 3000)),      # unrelated
        (b"A" * 100 + shared + b"B" * 50,
         b"CCC" + shared + b"DDDD"),                          # shared middle
        (shared, shared[100:4000]),                           # substring
    ]
    for base, target in cases:
        d = delta_encode(base, target)
        assert delta_decode(base, d) == target


def test_delta_compresses_shared_spans():
    rng = np.random.default_rng(5)
    shared = _rand_text(rng, 8000)
    base = _rand_text(rng, 500) + shared + _rand_text(rng, 400)
    target = _rand_text(rng, 300) + shared + _rand_text(rng, 200)
    d = delta_encode(base, target)
    assert delta_decode(base, d) == target
    # the 8 KB shared region collapses to copy ops: delta ≪ target
    assert len(d) < len(target) * 0.25


def test_delta_unrelated_stays_literal():
    rng = np.random.default_rng(9)
    base = _rand_text(rng, 2000)
    target = bytes(rng.integers(32, 127, 2000, dtype=np.uint8))
    d = delta_encode(base, target)
    assert delta_decode(base, d) == target
    # no usable anchors → essentially literal (+ op headers)
    assert len(d) >= len(target)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=60, deadline=None)
@given(base=st.binary(max_size=4000),
       target=st.binary(max_size=4000),
       min_copy=st.integers(min_value=4, max_value=256))
def test_delta_roundtrip_property(base, target, min_copy):
    """delta_decode(base, delta_encode(base, t)) == t for ALL inputs —
    the encoder may be suboptimal, never incorrect."""
    d = delta_encode(base, target, min_copy=min_copy)
    assert delta_decode(base, d) == target


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=8000),
       codec=st.sampled_from(["none", "zlib", "bz2", "lzma"]))
def test_codec_roundtrip_property(data, codec):
    from pcompress_ray.stages.compress import compress_chunk, decompress_chunk

    assert decompress_chunk(compress_chunk(data, codec), codec) == data


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=1, max_size=8000))
def test_gain_gate_never_grows_property(data):
    """select_and_compress never stores more bytes than the original."""
    from pcompress_ray.stages.compress import select_and_compress

    codec, payload = select_and_compress(data, "zlib", "zlib")
    assert len(payload) <= len(data)
    if codec == "none":
        assert payload == data


def test_delta_encode_members_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pcompress_ray.config import PipelineConfig
    from pcompress_ray.stages.delta import delta_encode_members

    rng = np.random.default_rng(11)
    shared = _rand_text(rng, 7000).decode()
    t0 = "intro " + shared + " outro"
    t1 = "other head " + shared + " tail bits"       # near-dup of t0
    t2 = _rand_text(rng, 4000).decode()              # canonical of its own
    t3 = bytes(rng.integers(33, 126, 4000, dtype=np.uint8)).decode()
    # member of cluster 0 sharing nothing → gain gate must null it
    pages = rd.from_arrow(pa.table({
        "rank": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([t0, t1, t2, t3], pa.string()),
    }))
    clusters = rd.from_arrow(pa.table({
        "rank": pa.array([0, 1, 2, 3], pa.int64()),
        "cluster_id": pa.array([0, 0, 2, 0], pa.int64()),
        "is_canonical": pa.array([True, False, True, False]),
    }))
    out = delta_encode_members(clusters, pages, PipelineConfig()) \
        .to_pandas().set_index("rank")
    assert sorted(out.index) == [1, 3]

    row = out.loc[1]
    assert row["base_rank"] == 0 and row["delta"] is not None
    assert row["delta_len"] < row["orig_len"] * 0.5
    assert delta_decode(t0.encode(), row["delta"]) == t1.encode()

    assert out.loc[3, "delta_len"] == -1            # gate: stored whole
    assert out.loc[3, "delta"] is None

"""WARC container reader/writer (sources/warc.py).

Pins the framing rules a Content-Length parser must honor: payload bytes
that LOOK like record boundaries must not split a record; per-record gzip
members must concatenate; non-response records are skipped; truncation is
loud under strict mode. End-to-end: a directory of .warc.gz files reads
into the pages shape through Ray Data.
"""
import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pytest

from pcompress_ray.sources.warc import (
    _EPOCH_BASE,
    parse_warc_bytes,
    read_warc_dir,
    synth_html,
    synth_warc_batch,
    warc_pages_batch,
    warc_record_bytes,
    write_warc,
)

RECS = [
    ("http://a.example.com/1", _EPOCH_BASE + 1, b"<html>plain</html>"),
    # the framing trap: body contains CRLFCRLF + a fake record magic
    ("http://a.example.com/2", _EPOCH_BASE + 2,
     b"<html>x\r\n\r\nWARC/1.0\r\nfake</html>"),
    ("http://a.example.com/3", _EPOCH_BASE + 3, bytes(range(256)) * 4),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    blob = write_warc(RECS, gzip_per_record=gz)
    got = list(parse_warc_bytes(blob))
    assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in RECS]
    # timestamps round-trip through ISO 8601
    for (u, ts, h), (_, iso, _) in zip(RECS, got):
        back = dt.datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ") \
            .replace(tzinfo=dt.timezone.utc)
        assert int(back.timestamp()) == ts


def test_non_response_records_skipped():
    blob = (warc_record_bytes("urn:info", _EPOCH_BASE, b"meta",
                              rec_type="warcinfo", http_envelope=False)
            + warc_record_bytes("http://x/1", _EPOCH_BASE, b"<html>a</html>")
            + warc_record_bytes("http://x/req", _EPOCH_BASE, b"GET / HTTP",
                                rec_type="request", http_envelope=False))
    got = list(parse_warc_bytes(blob))
    assert [u for u, _, _ in got] == ["http://x/1"]


def test_no_http_envelope_payload_kept_whole():
    rec = warc_record_bytes("http://x/raw", _EPOCH_BASE, b"\x00raw\xff",
                            rec_type="response", http_envelope=False)
    (_, _, html), = parse_warc_bytes(rec)
    assert html == b"\x00raw\xff"


def test_truncated_strict_raises_lenient_drops():
    blob = write_warc(RECS, leading_warcinfo=False)
    cut = blob[: len(blob) - 30]
    with pytest.raises(ValueError):
        list(parse_warc_bytes(cut))
    got = list(parse_warc_bytes(cut, strict=False))
    assert len(got) == len(RECS) - 1  # only the tail record lost


def test_bad_magic_strict():
    with pytest.raises(ValueError):
        list(parse_warc_bytes(b"NOTWARC/1.0\r\n\r\n"))


def test_synth_batch_and_parse_match():
    t = pa.table({"doc_id": pa.array([0, 5, 7], pa.int64()),
                  "text": pa.array(["alpha beta", "gamma", "delta"],
                                   pa.string())})
    blobs = synth_warc_batch(t)
    assert blobs["n_docs"].to_pylist() == [3]
    pages = warc_pages_batch(blobs)
    assert pages["url"].to_pylist() == [
        f"http://crawl.example.com/doc/{i}" for i in (0, 5, 7)]
    assert pages["html"].to_pylist() == [
        synth_html(0, "alpha beta"), synth_html(5, "gamma"),
        synth_html(7, "delta")]
    # the trap doc (doc_id % 5 == 0) really contains the fake boundary
    assert b"\r\n\r\n" in pages["html"].to_pylist()[0]
    assert pages["warc_ts"].cast(pa.int64()).to_pylist() == [
        (_EPOCH_BASE + i) * 1_000_000 for i in (0, 5, 7)]


def test_read_warc_dir_end_to_end(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n_files, per = 3, 20
    want_urls = []
    for f in range(n_files):
        recs = []
        for i in range(per):
            doc = f * per + i
            url = f"http://site{f}.example.com/p/{doc}"
            body = synth_html(doc, " ".join(
                rng.choice(["ba", "co", "da"], 10)))
            recs.append((url, _EPOCH_BASE + doc, body))
            want_urls.append(url)
        (tmp_path / f"part-{f}.warc.gz").write_bytes(
            write_warc(recs, gzip_per_record=True))
    pages = read_warc_dir(str(tmp_path))
    df = pages.to_pandas()
    assert sorted(df["url"]) == sorted(want_urls)
    assert df["html"].map(len).min() > 0
    assert str(df["warc_ts"].dtype).startswith("datetime64")


def test_wet_roundtrip_and_batch():
    from pcompress_ray.sources.warc import wet_pages_batch, write_wet

    recs = [("http://w/1", _EPOCH_BASE + 1, "plain text one"),
            # a WET text that STARTS with HTTP/ must not be envelope-stripped
            ("http://w/2", _EPOCH_BASE + 2, "HTTP/1.1 looks like\r\n\r\nan envelope"),
            ("http://w/3", _EPOCH_BASE + 3, "unicode é中文")]
    for gz in (False, True):
        blob = write_wet(recs, gzip_per_record=gz)
        t = wet_pages_batch(pa.table({"payload": pa.array([blob],
                                                          pa.binary())}))
        assert t["url"].to_pylist() == [u for u, _, _ in recs]
        assert t["text"].to_pylist() == [x for _, _, x in recs]
        assert t["warc_ts"].cast(pa.int64()).to_pylist() == [
            ts * 1_000_000 for _, ts, _ in recs]


def test_warc_roundtrip_property():
    """Hypothesis: arbitrary binary payloads (including CRLF runs, fake
    record magics, gzip magic bytes) survive write->parse bit-for-bit,
    plain and gzipped."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.lists(st.binary(min_size=0, max_size=400), min_size=1,
                        max_size=8)

    @settings(max_examples=40, deadline=None)
    @given(payloads, st.booleans())
    def prop(ps, gz):
        recs = [(f"http://h/{i}", _EPOCH_BASE + i, p)
                for i, p in enumerate(ps)]
        got = list(parse_warc_bytes(write_warc(recs, gzip_per_record=gz)))
        assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in recs]

    prop()

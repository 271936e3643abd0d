"""WARC (ISO 28500) web-archive source — the container Common-Crawl ships.

From-scratch record-level writer + parser over the public WARC/1.0 format
(no external warc library in this container):

  record   = "WARC/1.0\r\n" header-lines "\r\n" payload[Content-Length]
             "\r\n\r\n"
  file     = record record ...            (plain concatenation), or
             gzip(record) gzip(record) ...  (per-record gzip members — the
             Common-Crawl convention; zlib wbits=31 per member)

``response`` records carry an HTTP envelope; the parser strips it at the
first CRLFCRLF to yield the raw html bytes. Framing is by Content-Length
ONLY — a payload containing the bytes ``\r\n\r\nWARC/1.0`` must not split
a record (pinned in tests).

Reference analog: the reference ingests container formats through its
libarchive-based archive reader (archive/pc_archive.c extract path) and
re-emits typed streams; WARC is the web-corpus container, so this module
is that reader slot for the pages pipeline (S3 in SURVEY §2). Parsing is
a per-RECORD Python scan — container metadata work over header bytes,
with payloads sliced as zero-copy memoryviews — not a per-row hot path;
one WARC file is one task input, so a directory of files parallelizes
file-per-task exactly like the reference's per-archive workers.
"""

from __future__ import annotations

import gzip as _gzip
import io
import zlib

import numpy as np
import pyarrow as pa

_EPOCH_BASE = 1_700_000_000  # synthetic warc_ts base (seconds)


# --------------------------------------------------------------------------
# writer (also the test-side synthesizer)
# --------------------------------------------------------------------------

def _iso(ts_s: int) -> str:
    """Epoch seconds -> WARC-Date (ISO 8601 Zulu), pure integer math so a
    SQL twin can rebuild it (no locale/tz)."""
    import datetime as _dt

    d = _dt.datetime.fromtimestamp(int(ts_s), _dt.timezone.utc)
    return d.strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_record_bytes(url: str, ts_s: int, payload: bytes,
                      rec_type: str = "response",
                      http_envelope: bool = True) -> bytes:
    """One WARC/1.0 record. ``response`` records get a minimal HTTP/1.1
    envelope (status line + Content-Length + CRLFCRLF) like real crawls."""
    if http_envelope and rec_type == "response":
        env = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               + b"Content-Length: " + str(len(payload)).encode()
               + b"\r\n\r\n")
        body = env + payload
        ctype = "application/http; msgtype=response"
    else:
        body = payload
        ctype = "application/octet-stream"
    hdr = ("WARC/1.0\r\n"
           f"WARC-Type: {rec_type}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {_iso(ts_s)}\r\n"
           f"Content-Type: {ctype}\r\n"
           f"Content-Length: {len(body)}\r\n"
           "\r\n").encode()
    return hdr + body + b"\r\n\r\n"


def write_warc(records: list[tuple[str, int, bytes]],
               gzip_per_record: bool = False,
               leading_warcinfo: bool = True) -> bytes:
    """Serialize (url, ts_s, html) triples as one WARC file's bytes."""
    out = []
    if leading_warcinfo:
        out.append(warc_record_bytes("urn:warcinfo", _EPOCH_BASE,
                                     b"software: pcompress_ray\r\n",
                                     rec_type="warcinfo",
                                     http_envelope=False))
    for url, ts_s, payload in records:
        out.append(warc_record_bytes(url, ts_s, payload))
    if gzip_per_record:
        return b"".join(_gzip.compress(r, compresslevel=1) for r in out)
    return b"".join(out)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (Common-Crawl layout);
    passthrough if the blob is not gzip."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    out = io.BytesIO()
    pos = 0
    view = memoryview(blob)
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(view[pos:]))
        rest = d.unused_data
        if not rest:
            break
        pos = len(blob) - len(rest)
    return out.getvalue()


def parse_warc_bytes(blob: bytes, strict: bool = True,
                     record_types: frozenset = frozenset(
                         {"response", "conversion"})):
    """Yield (url, ts_iso, payload_bytes) for every record whose
    WARC-Type is in ``record_types`` — ``response`` (WARC crawls, HTTP
    envelope stripped) and ``conversion`` (WET extracted-text files,
    payload kept whole) by default.

    Content-Length framing only; other record types are skipped whole. A
    truncated trailing record raises ValueError under ``strict`` (a 100-TB
    ingest wants loud corruption). Lenient mode RESYNCS instead of
    truncating: a record whose framing is corrupt (bad magic, missing or
    negative Content-Length) is skipped to the next ``\\r\\nWARC/``
    boundary, so one bad record costs one record, not the rest of a
    multi-GB member (the cursor always moves forward — never a loop)."""
    data = _gunzip_members(blob)
    view = memoryview(data)
    pos, n = 0, len(data)

    def resync(frm: int) -> int:
        """Next plausible record start strictly after ``frm``, or n."""
        nxt = data.find(b"\r\nWARC/", frm + 1)
        return nxt + 2 if nxt >= 0 else n

    while pos < n:
        # tolerate inter-record padding CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if data[pos:pos + 5] != b"WARC/":
            if strict:
                raise ValueError(f"bad WARC magic at offset {pos}")
            pos = resync(pos)
            continue
        hend = data.find(b"\r\n\r\n", pos)
        if hend < 0:
            if strict:
                raise ValueError("truncated WARC header block")
            break
        headers: dict[str, str] = {}
        for line in data[pos:hend].decode("latin-1").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = -1
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    "WARC record missing Content-Length") from None
        if clen < 0:
            # missing/unparseable, or negative (which would move the
            # cursor BACKWARDS and loop forever): fatal in strict mode,
            # skip-to-next-record in lenient
            if strict:
                raise ValueError(f"negative WARC Content-Length {clen}")
            pos = resync(pos)
            continue
        body_start = hend + 4
        body_end = body_start + clen
        if body_end > n:
            if strict:
                raise ValueError("truncated WARC record body")
            # a LYING length mid-stream must not swallow later records;
            # a genuinely truncated trailing record resyncs to n and ends
            pos = resync(pos)
            continue
        if headers.get("warc-type") in record_types:
            body = view[body_start:body_end]
            # strip the HTTP envelope at its first CRLFCRLF — response
            # records only (a conversion record's TEXT may start "HTTP/")
            benv = bytes(body[:8])
            if (headers.get("warc-type") == "response"
                    and benv.startswith(b"HTTP/")):
                split = data.find(b"\r\n\r\n", body_start, body_end)
                html = bytes(view[split + 4:body_end]) if split >= 0 \
                    else bytes(body)
            else:
                html = bytes(body)
            yield (headers.get("warc-target-uri", ""),
                   headers.get("warc-date", ""), html)
        pos = body_end + 4  # record trailer CRLFCRLF


def warc_pages_batch(t: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Arrow batch of WARC file blobs -> exploded pages table
    (url, warc_ts [timestamp us], html). One-to-many per blob."""
    import datetime as _dt

    t = t.replace_schema_metadata(None)
    urls: list[str] = []
    ts_us: list[int] = []
    htmls: list[bytes] = []
    for blob in t[payload_col].to_pylist():
        for url, ts_iso, html in parse_warc_bytes(blob or b""):
            urls.append(url)
            d = _dt.datetime.strptime(ts_iso, "%Y-%m-%dT%H:%M:%SZ") \
                .replace(tzinfo=_dt.timezone.utc)
            ts_us.append(int(d.timestamp()) * 1_000_000)
            htmls.append(html)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts_us, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })


def read_warc_dir(path: str):
    """Directory of .warc / .warc.gz files -> pages Dataset
    (url, warc_ts, html): ray.data.read_binary_files (file-per-task,
    exactly the reference's per-archive worker split) + one exploding
    map_batches. Feed stages/extract.py downstream for text."""
    import ray.data as rd

    files = rd.read_binary_files(path)
    return files.map_batches(
        lambda t: warc_pages_batch(t, payload_col="bytes"),
        batch_format="pyarrow")


# --------------------------------------------------------------------------
# deterministic synthesis from the sf documents table (query/oracle side)
# --------------------------------------------------------------------------

def synth_html(doc_id: int, text: str) -> bytes:
    """Deterministic html payload a SQL twin can rebuild char-for-char.
    Contains a CRLFCRLF inside the body on every 5th doc — the framing
    trap a Content-Length parser must not fall into."""
    trap = "\r\n\r\n" if doc_id % 5 == 0 else " "
    return (f"<html><head><title>doc{doc_id}</title></head><body>{trap}"
            f"<p>{text}</p></body></html>").encode("utf-8")


def synth_warc_batch(t: pa.Table, gzip_per_record: bool = True) -> pa.Table:
    """documents batch -> one WARC blob per batch (plus its doc count)."""
    t = t.replace_schema_metadata(None)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t["text"].to_pylist()
    recs = [(f"http://crawl.example.com/doc/{i}", _EPOCH_BASE + int(i),
             synth_html(int(i), x or "")) for i, x in zip(ids, texts)]
    blob = write_warc(recs, gzip_per_record=gzip_per_record)
    return pa.table({"payload": pa.array([blob], pa.binary()),
                     "n_docs": pa.array([len(recs)], pa.int64())})


def write_wet(records: list[tuple[str, int, str]],
              gzip_per_record: bool = False) -> bytes:
    """WET sibling of ``write_warc``: ``conversion`` records carrying the
    extracted plain text (utf-8), no HTTP envelope — the format
    Common-Crawl publishes alongside raw WARC."""
    out = [warc_record_bytes("urn:warcinfo", _EPOCH_BASE,
                             b"format: WET\r\n", rec_type="warcinfo",
                             http_envelope=False)]
    for url, ts_s, text in records:
        out.append(warc_record_bytes(url, ts_s, text.encode("utf-8"),
                                     rec_type="conversion",
                                     http_envelope=False))
    if gzip_per_record:
        return b"".join(_gzip.compress(r, compresslevel=1) for r in out)
    return b"".join(out)


def wet_pages_batch(t: pa.Table, payload_col: str = "payload") -> pa.Table:
    """WET file blobs -> (url, warc_ts, text) — the text-only ingest path
    (skips the extractor entirely)."""
    import datetime as _dt

    t = t.replace_schema_metadata(None)
    urls: list[str] = []
    ts_us: list[int] = []
    texts: list[str] = []
    for blob in t[payload_col].to_pylist():
        for url, ts_iso, payload in parse_warc_bytes(
                blob or b"", record_types=frozenset({"conversion"})):
            urls.append(url)
            d = _dt.datetime.strptime(ts_iso, "%Y-%m-%dT%H:%M:%SZ") \
                .replace(tzinfo=_dt.timezone.utc)
            ts_us.append(int(d.timestamp()) * 1_000_000)
            texts.append(payload.decode("utf-8", "replace"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts_us, pa.timestamp("us")),
        "text": pa.array(texts, pa.string()),
    })

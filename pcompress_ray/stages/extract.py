"""Text extraction + normalization (stateless map_batches stage).

Plays the role of the reference's preprocessing filters + analyzer
(filters/analyzer/analyzer.c:32-124 classifies buffers; archive filters
transform bytes before chunking, archive/pc_arc_filter.c:71-125): a
byte-deterministic transform applied before chunking/shingling. The north
rule's per-row invariant — byte-identical extracted text per url across runs
and parallelism levels — is guaranteed by keeping this pure: regex +
str.lower + whitespace collapse only, no locale, no dict iteration order.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TAG = re.compile(rb"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<[^>]*>", re.S | re.I)
_ENT = {b"&amp;": b"&", b"&lt;": b"<", b"&gt;": b">", b"&quot;": b'"',
        b"&#39;": b"'", b"&nbsp;": b" "}
_WS = re.compile(rb"\s+")
_TOKEN = re.compile(r"[a-z0-9]+")


def extract_html_bytes(html: bytes) -> str:
    """Strip tags/scripts/styles, decode basic entities, collapse whitespace.

    Operates on bytes end-to-end (utf-8 decoded only at the end, with
    replacement) so the result is a pure function of the input bytes.
    """
    if not html:
        return ""
    txt = _TAG.sub(b" ", html)
    for ent, rep in _ENT.items():
        if ent in txt:
            txt = txt.replace(ent, rep)
    txt = _WS.sub(b" ", txt).strip()
    return txt.decode("utf-8", "replace")


def normalize_text(text: str) -> str:
    """Canonical text form fed to shingling: lowercase + collapsed whitespace."""
    return " ".join((text or "").lower().split())


def tokenize(text: str) -> list[str]:
    """Word tokens of normalized text — the one tokenizer every stage shares."""
    return _TOKEN.findall((text or "").lower())


class Extractor:
    """map_batches stage: html binary (or raw text) → normalized text column.

    Input: pyarrow batch with ``html`` (binary, optional) and/or ``text``.
    Output: adds ``text_norm`` (string). When ``html`` is present it wins,
    otherwise ``text`` is normalized directly.
    """

    def __init__(self, html_col: str = "html", text_col: str = "text",
                 out_col: str = "text_norm"):
        self.html_col = html_col
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        if self.html_col in batch.column_names:
            htmls = batch[self.html_col].to_pylist()
            out = [normalize_text(extract_html_bytes(h or b"")) for h in htmls]
        else:
            texts = batch[self.text_col].to_pylist()
            out = [normalize_text(t) for t in texts]
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))

"""PII redaction stage: vectorized regex scrubbing of emails / IPv4 /
phone-shaped tokens.

Reference parity: pcompress's preprocessing filter chain rewrites the byte
stream before dedup/compression (archive/pc_arc_filter.c:71-125 routes
per-type filters; preproc in pcompress.c applies them in a fixed order) —
the webtext curation analog is a fixed-order pattern-rewrite pass every
large-scale training pipeline runs before publishing a corpus.

Patterns are the COMMON syntax subset of Python ``re`` and RE2 (character
classes, bounded repeats, ``\\b`` word boundaries — no backrefs, no
lookaround), so the DuckDB oracle can run the byte-identical pattern with
``regexp_replace(..., 'g')``.  Counts are taken on the ORIGINAL text,
replacements applied in the fixed order email -> ipv4 -> phone (the same
order on both sides; placeholders contain no digits or ``@`` so later
patterns cannot match inside earlier replacements).

Scale shape: stateless ``map_batches`` over pandas string kernels
(``Series.str.count`` / ``.str.replace`` — compiled once at module import,
C-speed per batch); no shuffle, no state, embarrassingly parallel.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# ordered: replacement applies in this order on both engines
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS]


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, n_email, n_ipv4, n_phone, red_text).

    Counts are per-pattern match counts on the input text; ``red_text`` is
    the text after all replacements in PII_PATTERNS order.
    """
    t = t.replace_schema_metadata(None)
    s = pd.Series(t[text_col].to_pandas()).fillna("")
    cols: dict[str, pa.Array] = {
        "doc_id": t["doc_id"].cast(pa.int64())}
    red = s
    for name, rx, repl in _COMPILED:
        cols[f"n_{name}"] = pa.array(
            s.str.count(rx).to_numpy(np.int64), pa.int64())
        red = red.str.replace(rx, repl, regex=True)
    cols["red_text"] = pa.array(red.to_numpy(), pa.string())
    return pa.table(cols)

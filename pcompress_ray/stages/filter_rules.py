"""C4/Gopher-style heuristic document filter: a fixed ordered rule set
evaluated per doc into a FAIL BITMASK (bit i set = rule i failed) plus the
final keep flag.

Reference parity: pcompress gates work per block before spending effort on
it (the incompressible-data gate and adaptive type routing,
pcompress.c:3698-3741 + utils/utils.h:276-324 type dispatch) — the webtext
analog is the heuristic pre-filter every training pipeline runs before the
expensive dedup/model stages (C4, Raffel et al. 2020 §2.2; Gopher, Rae et
al. 2021 §A1.1).

All thresholds are exact-integer comparisons (``5*max_tok > n_tokens``
instead of ``ratio > 0.2``) so the DuckDB twin — generated from the SAME
module constants — matches bit-for-bit with no float rounding caveat.

Scale shape: stateless ``map_batches``; one Arrow split + two numpy
reduceat passes per batch; no shuffle.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# rule order defines bitmask bit positions; names are frozen API
RULE_NAMES = ["min_words", "max_words", "mean_word_len",
              "max_tok_ratio", "stopword", "blocklist"]
MIN_WORDS = 20
MAX_WORDS = 5000
MEAN_LEN_LO = 2   # fail if sum(len) <  LO * n_tokens
MEAN_LEN_HI = 12  # fail if sum(len) >  HI * n_tokens
MAX_TOK_NUM = 1   # fail if max_tok_count * DEN > n_tokens * NUM  (ratio>1/5)
MAX_TOK_DEN = 5
STOPWORDS = ["the", "of", "and", "to", "in", "a"]
BLOCKLIST = ["lorem", "ipsum", "javascript"]


def heuristic_filter_batch(t: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """(doc_id, text) -> (doc_id, n_tokens, fail_mask, keep).

    Empty/null docs: fail min_words and stopword; the length-normalized
    rules (mean_word_len, max_tok_ratio) only apply when n_tokens > 0.
    """
    from pcompress_ray.stages.textstats import _doc_token_runs, _split_tokens

    t = t.replace_schema_metadata(None)
    n = len(t)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    doc, words = _split_tokens(t, text_col)

    n_tokens = np.bincount(doc, minlength=n).astype(np.int64)
    wl = pd.Series(words).str.len().to_numpy(np.int64)
    sumlen = np.bincount(doc, weights=wl, minlength=n).astype(np.int64)
    has_stop = np.bincount(
        doc, weights=pd.Series(words).isin(STOPWORDS).to_numpy(np.float64),
        minlength=n) > 0
    has_block = np.bincount(
        doc, weights=pd.Series(words).isin(BLOCKLIST).to_numpy(np.float64),
        minlength=n) > 0
    max_tok = np.zeros(n, dtype=np.int64)
    if doc.size:
        gdoc, _, counts, _ = _doc_token_runs(doc, words)
        np.maximum.at(max_tok, gdoc, counts)

    pos = n_tokens > 0
    fails = [
        n_tokens < MIN_WORDS,
        n_tokens > MAX_WORDS,
        pos & ((sumlen < MEAN_LEN_LO * n_tokens)
               | (sumlen > MEAN_LEN_HI * n_tokens)),
        pos & (MAX_TOK_DEN * max_tok > MAX_TOK_NUM * n_tokens),
        ~has_stop,
        has_block,
    ]
    mask = np.zeros(n, dtype=np.int64)
    for bit, f in enumerate(fails):
        mask |= f.astype(np.int64) << bit
    return pa.table({
        "doc_id": pa.array(ids),
        "n_tokens": pa.array(n_tokens),
        "fail_mask": pa.array(mask),
        "keep": pa.array((mask == 0).astype(np.int64)),
    })


def heuristic_filter_sql() -> str:
    """DuckDB twin generated from the same constants (byte-identical
    thresholds, same bit positions)."""
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    block = ", ".join(f"'{w}'" for w in BLOCKLIST)
    return f"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(coalesce(text, ''), ' '),
                                       x -> x <> '') AS tk
            FROM documents
        ), stats AS (
            SELECT doc_id, len(tk) AS n_tokens,
                   COALESCE(list_sum(list_transform(tk, x -> length(x))), 0)
                       AS sumlen,
                   CASE WHEN list_has_any(tk, [{stop}]) THEN 1 ELSE 0 END
                       AS has_stop,
                   CASE WHEN list_has_any(tk, [{block}]) THEN 1 ELSE 0 END
                       AS has_block
            FROM toks
        ), mx AS (
            SELECT doc_id, MAX(c) AS max_tok
            FROM (SELECT doc_id, COUNT(*) AS c
                  FROM (SELECT doc_id, unnest(tk) AS w FROM toks)
                  GROUP BY doc_id, w)
            GROUP BY doc_id
        ), m AS (
            SELECT s.doc_id, s.n_tokens,
                   CASE WHEN s.n_tokens < {MIN_WORDS} THEN 1 ELSE 0 END
                 + CASE WHEN s.n_tokens > {MAX_WORDS} THEN 2 ELSE 0 END
                 + CASE WHEN s.n_tokens > 0 AND
                        (s.sumlen < {MEAN_LEN_LO} * s.n_tokens OR
                         s.sumlen > {MEAN_LEN_HI} * s.n_tokens)
                        THEN 4 ELSE 0 END
                 + CASE WHEN s.n_tokens > 0 AND
                        {MAX_TOK_DEN} * COALESCE(mx.max_tok, 0) >
                        {MAX_TOK_NUM} * s.n_tokens
                        THEN 8 ELSE 0 END
                 + CASE WHEN s.has_stop = 0 THEN 16 ELSE 0 END
                 + CASE WHEN s.has_block = 1 THEN 32 ELSE 0 END AS fail_mask
            FROM stats s LEFT JOIN mx ON s.doc_id = mx.doc_id
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(fail_mask AS BIGINT) AS fail_mask,
               CAST(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS keep
        FROM m ORDER BY doc_id
    """

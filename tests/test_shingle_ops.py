"""Unit oracles for the shingle-novelty / source-overlap / fingerprint
kernels (pure in-process — the distributed twins are covered by
tests/test_query_oracles.py against the DuckDB SQL)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.textstats import (
    doc_shingle_rows,
    doc_shingle_stats,
    sha_prefix_fingerprint,
)


def _tbl(texts, ids=None, **extra):
    cols = {"doc_id": pa.array(ids or list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string())}
    for k, v in extra.items():
        cols[k] = pa.array(v, pa.string())
    return pa.table(cols)


def _py_shingles(text, n=3):
    toks = [w for w in (text or "").split(" ") if w]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_doc_shingle_rows_matches_python_sets():
    texts = ["a b c d", "a b c", "x  y", None, "", "a b"]
    t = _tbl(texts)
    out = doc_shingle_rows(t)
    got = {}
    for d, sh in zip(out["doc_id"].to_pylist(), out["sh"].to_pylist()):
        got.setdefault(d, set()).add(sh)
    for i, txt in enumerate(texts):
        assert got.get(i, set()) == _py_shingles(txt), i
    # distinct per doc: repeated shingle emitted once
    rep = doc_shingle_rows(_tbl(["a b c a b c a b c"]))
    shs = rep["sh"].to_pylist()
    assert len(shs) == len(set(shs))


def test_doc_shingle_stats_counts_every_doc():
    texts = ["a b c d e", "", None, "a b"]
    out = doc_shingle_stats(_tbl(texts))
    assert out["doc_id"].to_pylist() == [0, 1, 2, 3]
    assert out["n_shingles"].to_pylist() == [3, 0, 0, 0]


def test_doc_shingle_rows_carry_col():
    t = _tbl(["a b c", "a b c"], source=["s1", "s2"])
    out = doc_shingle_rows(t, carry_col="source")
    assert sorted(zip(out["source"].to_pylist(), out["sh"].to_pylist())) == \
        [("s1", "a b c"), ("s2", "a b c")]


def test_sha_prefix_fingerprint_partials_combine():
    texts = ["hello", "world", None, "hello"]
    langs = ["en", "en", "de", "de"]
    t = _tbl(texts, **{})
    t = t.set_column(1, "text", pa.array(texts, pa.string()))
    t = t.append_column("lang", pa.array(langs, pa.string()))
    out = sha_prefix_fingerprint(t)
    by_lang = {r["lang"]: r for r in out.to_pylist()}

    def pref(x):
        return int(hashlib.sha256((x or "").encode()).hexdigest()[:15], 16)

    assert by_lang["en"]["n_docs"] == 2
    assert by_lang["en"]["fingerprint"] == pref("hello") ^ pref("world")
    assert by_lang["de"]["fingerprint"] == pref(None) ^ pref("hello")
    # XOR partials combine order-independently: split table halves
    f_a = sha_prefix_fingerprint(t.slice(0, 2))
    f_b = sha_prefix_fingerprint(t.slice(2))
    combined = {}
    for part in (f_a, f_b):
        for r in part.to_pylist():
            prev = combined.get(r["lang"], 0)
            combined[r["lang"]] = prev ^ r["fingerprint"]
    assert combined["en"] == by_lang["en"]["fingerprint"]
    assert combined["de"] == by_lang["de"]["fingerprint"]
    assert np.all(out["fingerprint"].to_numpy() >= 0)  # 60-bit < int64 max

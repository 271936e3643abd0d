"""URL canonicalization kernel: hand-written general inputs (beyond the
synthesized distribution) plus Python↔SQL twin parity on the synthesis."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pcompress_ray.stages.urlnorm import (  # noqa: E402
    canonicalize_sql,
    canonicalize_urls,
    synthesize_messy_urls,
    synthesize_messy_urls_sql,
)

CASES = [
    # fragment strip
    ("http://a.com/x#sec", "http://a.com/x"),
    # scheme+host case-fold, path case preserved
    ("HTTPS://WWW.Ex.COM/Path/File", "https://www.ex.com/Path/File"),
    # default ports (scheme-aware: :443 on http is NOT default)
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:443/x", "http://a.com:443/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # utm removal: only param / first param / middle / last
    ("http://a.com/x?utm_source=t", "http://a.com/x"),
    ("http://a.com/x?utm_a=1&q=2", "http://a.com/x?q=2"),
    ("http://a.com/x?q=1&utm_b=2&r=3", "http://a.com/x?q=1&r=3"),
    ("http://a.com/x?q=1&utm_campaign=c", "http://a.com/x?q=1"),
    # trailing slash (incl. after utm-only query removal)
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/", "http://a.com"),
    ("http://a.com/x/?utm_y=1", "http://a.com/x"),
    # multiple trailing slashes
    ("http://a.com/x//", "http://a.com/x"),
    # non-utm params preserved verbatim (incl. case and order)
    ("http://a.com/x?B=2&a=1", "http://a.com/x?B=2&a=1"),
]


def test_canonicalize_hand_cases():
    got = canonicalize_urls(pd.Series([c[0] for c in CASES]))
    want = [c[1] for c in CASES]
    assert got.tolist() == want


def test_canonicalize_sql_twin_on_hand_cases():
    """The DuckDB expression applies the same rules to arbitrary URLs."""
    import duckdb

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": [c[0] for c in CASES]}))
    out = con.execute(
        f"SELECT {canonicalize_sql('url')} AS c FROM t").df()["c"].tolist()
    assert out == [c[1] for c in CASES]


def test_synthesis_parity_and_grouping():
    import duckdb

    d = np.arange(1000, dtype=np.int64)
    urls = synthesize_messy_urls(d)
    canon = canonicalize_urls(urls)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": d}))
    sql_urls = con.execute(
        f"SELECT {synthesize_messy_urls_sql('doc_id')} AS u FROM docs "
        "ORDER BY doc_id").df()["u"]
    assert (sql_urls.to_numpy() == urls.to_numpy()).all()
    # canonical identity depends only on doc_id % 50
    groups = pd.DataFrame({"g": d % 50, "c": canon})
    assert (groups.groupby("g")["c"].nunique() == 1).all()
    assert canon.nunique() == 50
    # null-safety
    assert canonicalize_urls(pd.Series([None, ""])).tolist() == ["://", "://"]

"""URL canonicalization properties under adversarial input: never raises,
idempotent (re-canonicalizing a canonical URL is a no-op — a canonicalizer
that drifts corrupts every re-crawled CDX key), and SURT keying is total."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pcompress_ray.stages.urlnorm import canonicalize_urls, surt_keys  # noqa: E402

# printable junk + url-ish fragments + unicode, with None sprinkled in
_urlish = st.one_of(
    st.text(max_size=80),
    st.builds(
        lambda sch, host, path, q: f"{sch}://{host}/{path}?{q}",
        st.sampled_from(["http", "HTTP", "https", "ftp", ""]),
        st.text(alphabet="abcDEF.:0189-", max_size=20),
        st.text(alphabet="ab/.%20#&=", max_size=20),
        st.text(alphabet="abc=&utm_source=x;", max_size=20)),
    st.none(),
)


@settings(max_examples=300, deadline=2000)
@given(urls=st.lists(_urlish, min_size=1, max_size=8))
def test_canonicalize_total_and_idempotent(urls):
    s = pd.Series(urls, dtype=object)
    once = canonicalize_urls(s)
    assert once.notna().all()
    twice = canonicalize_urls(once)
    assert (once == twice).all()
    keys = surt_keys(once)
    assert keys.notna().all()


@settings(max_examples=150, deadline=3000)
@given(urls=st.lists(_urlish.filter(lambda x: x is None or "'" not in x),
                     min_size=1, max_size=6))
def test_pandas_and_sql_twins_agree(urls):
    """The DuckDB twin must produce byte-identical canonical urls — even
    on newline-bearing junk, where Python re '$' and RE2 '$' disagree
    (the reason every end-anchor in this module is either '\\Z', an
    explicit contains-guard, or '[\\s\\S]*')."""
    import duckdb

    from pcompress_ray.stages.urlnorm import canonicalize_sql

    s = pd.Series(urls, dtype=object)
    eng = canonicalize_urls(s).tolist()
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": s}))
    expr = canonicalize_sql("coalesce(url, '')")
    sql = con.sql(f"SELECT {expr} AS c FROM u").df()["c"].tolist()
    assert eng == sql

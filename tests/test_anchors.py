"""Parse-fidelity oracles for extract_links_batch / anchor_index: attribute
order, case, nested markup, multiline anchors, empty hrefs, binary input —
plus the distributed index aggregation semantics (tie-breaks, distinct
sources)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pcompress_ray.stages.extract import extract_links_batch


def _links(htmls, ids=None):
    t = pa.table({
        "doc_id": pa.array(ids or list(range(len(htmls))), pa.int64()),
        "html": pa.array(htmls, pa.string()),
    })
    out = extract_links_batch(t)
    return list(zip(out["doc_id"].to_pylist(), out["link_no"].to_pylist(),
                    out["href"].to_pylist(), out["anchor"].to_pylist()))


def test_extracts_attrs_case_nesting_multiline():
    html = (
        '<p>pre</p>'
        '<a rel="nofollow" href="http://x.com/a" target="_b">First Link</a>'
        '<A HREF="http://y.com/b">UPPER <b>bold</b>\n  text</A>'
        '<a href="">dropped empty</a>'
        '<a name="no-href-anchor">not a link</a>'
        '<a href="/rel path">rel</a>'
    )
    got = _links([html])
    assert got == [
        (0, 0, "http://x.com/a", "first link"),
        (0, 1, "http://y.com/b", "upper bold text"),
        (0, 2, "/rel path", "rel"),
    ]


def test_binary_html_and_null_and_linkless_docs():
    t = pa.table({
        "doc_id": pa.array([5, 6, 7], pa.int64()),
        "html": pa.array([b'<a href="u">t</a>', None, b"<p>none</p>"],
                         pa.binary()),
    })
    out = extract_links_batch(t)
    assert out["doc_id"].to_pylist() == [5]
    assert out["href"].to_pylist() == ["u"]
    assert out["anchor"].to_pylist() == ["t"]


def test_anchor_index_counts_and_tie_break():
    import ray.data as rd

    from pcompress_ray.stages.extract import anchor_index

    # target T: doc0 links twice ("zz"), doc1 once ("aa") -> n_links=3,
    # n_src_docs=2, top by count is "zz"; target U: one "aa" and one "bb"
    # each once -> lexical tie-break picks "aa".
    htmls = [
        '<a href="T">zz</a><a href="T">zz</a><a href="U">bb</a>',
        '<a href="T">aa</a><a href="U">aa</a>',
    ]
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "html": pa.array(htmls, pa.string())})
    links = rd.from_arrow(extract_links_batch(t)).repartition(3)
    out = anchor_index(links, n_parts=4).to_pandas() \
        .sort_values("href").reset_index(drop=True)
    assert out["href"].tolist() == ["T", "U"]
    assert out["n_links"].tolist() == [3, 2]
    assert out["n_src_docs"].tolist() == [2, 2]
    assert out["top_anchor"].tolist() == ["zz", "aa"]


def test_matches_python_reference_on_random_pages():
    import re

    import ray.data as rd

    from pcompress_ray.stages.extract import anchor_index

    rng = np.random.default_rng(11)
    targets = [f"http://t{i}.example/" for i in range(8)]
    words = ["red", "blue", "green", "bold"]
    htmls, ids = [], []
    for d in range(25):
        n = int(rng.integers(0, 6))
        parts = [f'<a href="{targets[int(rng.integers(0, 8))]}">'
                 f'{words[int(rng.integers(0, 4))]}</a>' for _ in range(n)]
        htmls.append("<html>" + "".join(parts) + "</html>")
        ids.append(d)

    exp: dict[str, dict] = {}
    for d, h in zip(ids, htmls):
        for m in re.finditer(r'<a href="([^"]*)">([a-z]+)</a>', h):
            e = exp.setdefault(m.group(1),
                               {"n": 0, "src": set(), "cnt": {}})
            e["n"] += 1
            e["src"].add(d)
            e["cnt"][m.group(2)] = e["cnt"].get(m.group(2), 0) + 1

    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "html": pa.array(htmls, pa.string())})
    links = rd.from_arrow(extract_links_batch(t)).repartition(4)
    out = anchor_index(links, n_parts=4).to_pandas()
    assert len(out) == len(exp)
    for r in out.itertuples():
        e = exp[r.href]
        assert r.n_links == e["n"]
        assert r.n_src_docs == len(e["src"])
        best = sorted(e["cnt"].items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert r.top_anchor == best

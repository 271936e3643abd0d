"""Planted-fixture oracle for line_dedup_rewrite: boilerplate lines
(trimmed form in >= min_docs distinct docs) vanish from EVERY doc; blank
and unique lines pass through byte-identical (including the surrounding
whitespace the trim key ignores)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _run(texts, ids=None, min_docs=2):
    import ray.data as rd

    from pcompress_ray.stages.rewrite import line_dedup_rewrite

    docs = pa.table({
        "doc_id": pa.array(ids or list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = line_dedup_rewrite(rd.from_arrow(docs).repartition(3),
                             min_docs=min_docs, n_parts=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_boilerplate_removed_everywhere_uniques_kept():
    texts = [
        "cookie banner\nunique alpha\n\nfooter text",
        "  cookie banner \nunique beta\nfooter text",   # trim-equal banner
        "unique gamma\nsolo line",
    ]
    out = _run(texts)
    assert out["doc_id"].tolist() == [0, 1, 2]
    # banner + footer occur in 2 docs -> removed from BOTH (trim-matched);
    # the blank line and uniques survive byte-identical
    assert out["new_text"].tolist() == [
        "unique alpha\n", "unique beta", "unique gamma\nsolo line"]
    assert out["n_lines"].tolist() == [4, 3, 2]
    assert out["n_kept"].tolist() == [2, 1, 2]


def test_blank_lines_never_removed_and_repeat_within_one_doc_kept():
    # same line 3x INSIDE one doc = 1 distinct doc -> kept (cross-doc
    # frequency, not raw frequency, drives removal)
    texts = ["x y\nx y\nx y\n\n\n", "other stuff\n\n"]
    out = _run(texts)
    assert out["new_text"].tolist() == [texts[0], texts[1]]
    assert (out["n_lines"] == out["n_kept"]).all()


def test_min_docs_threshold():
    texts = ["shared line\na0", "shared line\na1", "shared line\na2"]
    kept3 = _run(texts, min_docs=4)
    assert kept3["new_text"].tolist() == texts          # below threshold
    gone = _run(texts, min_docs=3)
    assert gone["new_text"].tolist() == ["a0", "a1", "a2"]


def test_carry_cols_ride_both_exchanges():
    """carry_cols (url) survive the line-keyed and doc-keyed exchanges
    and land once per doc on the rewritten output — including docs whose
    every line was scrubbed, and empty-text docs."""
    import ray.data as rd

    from pcompress_ray.stages.rewrite import line_dedup_rewrite

    texts = ["cookie banner\nunique alpha",
             "cookie banner\nunique beta",
             "cookie banner",            # scrubbed to nothing
             ""]                         # empty text
    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "url": pa.array([f"http://h{i}.com/p" for i in range(4)]),
        "text": pa.array(texts, pa.string())})
    out = line_dedup_rewrite(rd.from_arrow(docs).repartition(3),
                             min_docs=2, n_parts=4,
                             carry_cols=("url",)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["url"].tolist() == [f"http://h{i}.com/p" for i in range(4)]
    assert out["new_text"].tolist() == ["unique alpha", "unique beta",
                                        "", ""]
    # baseline without carry is unchanged (no url column)
    base = _run(texts)
    assert "url" not in base.columns
    assert base["new_text"].tolist() == out["new_text"].tolist()


def test_all_lines_removed_emits_empty_doc():
    texts = ["dup one\ndup two", "dup one\ndup two", "keep me"]
    out = _run(texts)
    assert out["new_text"].tolist() == ["", "", "keep me"]
    assert out["n_kept"].tolist() == [0, 0, 1]


def test_matches_python_reference_on_random_corpus():
    rng = np.random.default_rng(7)
    pool = [f"line {i} tok {i*7%13}" for i in range(30)]
    texts = ["\n".join(rng.choice(pool, size=rng.integers(1, 12)))
             for _ in range(40)]
    out = _run(texts)

    trim = " \t\r\x0b\x0c"
    docs_of = {}
    for d, t in enumerate(texts):
        for ln in set(t.split("\n")):
            docs_of.setdefault(ln.strip(trim), set()).add(d)
    exp = []
    for t in texts:
        kept = [ln for ln in t.split("\n")
                if ln.strip(trim) == ""
                or len(docs_of[ln.strip(trim)]) < 2]
        exp.append("\n".join(kept))
    assert out["new_text"].tolist() == exp


def test_parallelism_invariance():
    """north-rule bar: output is a pure function of the input — block
    count and partition count must not change a single byte."""
    import pandas as pd
    import ray.data as rd

    from pcompress_ray.stages.rewrite import line_dedup_rewrite

    rng = np.random.default_rng(17)
    pool = [f"ln {i}" for i in range(12)]
    texts = ["\n".join(rng.choice(pool, size=rng.integers(1, 8)))
             for _ in range(30)]
    docs = pa.table({"doc_id": pa.array(list(range(30)), pa.int64()),
                     "text": pa.array(texts)})

    def run(nblocks, n_parts):
        return line_dedup_rewrite(rd.from_arrow(docs).repartition(nblocks),
                                  n_parts=n_parts).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    a = run(2, 3)
    b = run(7, 11)
    pd.testing.assert_frame_equal(a, b)


def test_carry_equals_join_property(ray_session):
    """Hypothesis: for ANY corpus shape, the carry_cols output equals the
    old recover-by-join construction row for row."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.stages.rewrite import line_dedup_rewrite

    line = st.sampled_from(["dup line", " dup line ", "", "  ",
                            "uniq-a", "uniq-b", "x y"])
    doc = st.lists(line, min_size=0, max_size=5).map("\n".join)

    @settings(max_examples=6, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        docs = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "url": pa.array([f"u://{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.string())})
        ds = rd.from_arrow(docs).repartition(2)
        carry = line_dedup_rewrite(ds, min_docs=2, n_parts=3,
                                   carry_cols=("url",)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        plain = line_dedup_rewrite(ds, min_docs=2, n_parts=3).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        joined = plain.merge(
            pd.DataFrame({"doc_id": range(len(texts)),
                          "url": [f"u://{i}" for i in range(len(texts))]}),
            on="doc_id")
        cols = ["doc_id", "n_lines", "n_kept", "new_text", "url"]
        assert carry[cols].equals(joined[cols])

    run()

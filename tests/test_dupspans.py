"""Corpus-wide duplicate-span stage == brute-force gram oracle on a
planted corpus; broadcast marking == positional semi-join fallback."""
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pcompress_ray.stages.dupspans import (
    _coverage_from_offsets, dup_span_stats, partial_gram_counts)


def _brute(docs: dict[int, str], L: int) -> pd.DataFrame:
    cnt = Counter()
    for t in docs.values():
        for i in range(len(t) - L + 1):
            cnt[t[i:i + L]] += 1
    rows = []
    for did in sorted(docs):
        t = docs[did]
        offs = [i for i in range(len(t) - L + 1) if cnt[t[i:i + L]] >= 2]
        if not offs:
            continue
        spans = []
        for o in offs:
            if spans and o <= spans[-1][1]:     # overlap or touch
                spans[-1][1] = o + L
            else:
                spans.append([o, o + L])
        rows.append({"doc_id": did, "dup_starts": len(offs),
                     "n_spans": len(spans),
                     "dup_chars": sum(e - s for s, e in spans)})
    return pd.DataFrame(rows)


def _planted_docs() -> dict[int, str]:
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz "), dtype="<U1")

    def rand(n):
        return "".join(rng.choice(alpha, size=n))

    shared = rand(60)                       # long shared span, 2 docs
    boiler = rand(25)                       # boilerplate in many docs
    docs = {
        0: rand(40) + shared + rand(30),
        1: rand(35) + shared + rand(20) + boiler,
        2: boiler + rand(80),
        3: rand(50) + boiler + rand(10) + boiler,   # intra-doc repeat
        4: rand(120),                       # clean
        5: "tiny",                          # shorter than L
        6: rand(90),                        # clean
    }
    docs[7] = docs[0]                       # exact dup doc
    return docs


@pytest.mark.parametrize("L", [8, 16])
def test_dup_spans_match_brute_force(ray_session, L):
    import ray.data as rd

    docs = _planted_docs()
    want = _brute(docs, L)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))

    got_b = dup_span_stats(ds, L=L).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_b, want.reset_index(drop=True), check_dtype=False)

    # force the positional semi-join path; must agree exactly
    got_s = dup_span_stats(ds, L=L, broadcast_limit=0,
                           n_parts=5).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_s, want.reset_index(drop=True), check_dtype=False)


def test_partial_counts_distinct_per_batch():
    t = pa.table({"doc_id": [1, 2], "text": ["abcabc", "abcx"]})
    out = partial_gram_counts(t, 3)
    # grams: abc,bca,cab,abc | abc,bcx -> abc count 3, others 1
    cnts = sorted(out["cnt"].to_pylist())
    assert cnts == [1, 1, 1, 3]


def test_coverage_from_offsets_islands():
    # offsets 0,1,2 merge (gap<=L), 30 separate, L=4
    s, n, c = _coverage_from_offsets(np.array([0, 1, 2, 30]), 4)
    assert (s, n, c) == (4, 2, 10)
    # touching exactly at gap == L merges
    s, n, c = _coverage_from_offsets(np.array([0, 4]), 4)
    assert (s, n, c) == (2, 1, 8)
    s, n, c = _coverage_from_offsets(np.array([0, 5]), 4)
    assert (s, n, c) == (2, 2, 8)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=80, deadline=None)
@given(offs=st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                     max_size=60, unique=True),
       L=st.integers(min_value=1, max_value=20))
def test_coverage_property(offs, L):
    offs = np.array(sorted(offs), dtype=np.int64)
    s, n, c = _coverage_from_offsets(offs, L)
    ivs = []
    for o in offs.tolist():
        if ivs and o <= ivs[-1][1]:
            ivs[-1][1] = o + L
        else:
            ivs.append([o, o + L])
    assert s == offs.size and n == len(ivs)
    assert c == sum(e - b for b, e in ivs)


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=40, deadline=None)
@given(texts=st.lists(st.text(alphabet="abcd", min_size=0, max_size=80),
                      min_size=1, max_size=8),
       L=st.integers(min_value=2, max_value=6))
def test_gram_hash_marking_matches_literal(texts, L):
    """128-bit rolling-hash duplicated-gram marking == literal-substring
    marking on adversarially repetitive small alphabets (no Ray; kernel
    only)."""
    from pcompress_ray.stages.dupspans import _P1, _P2, _codepoints, _poly_kgram

    lit = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            lit[t[i:i + L]] += 1
    hc = Counter()
    per_doc = []
    for t in texts:
        x = _codepoints(t)
        h1, h2 = _poly_kgram(x, L, _P1), _poly_kgram(x, L, _P2)
        keys = list(zip(h1.tolist(), h2.tolist()))
        per_doc.append((t, keys))
        hc.update(keys)
    for t, keys in per_doc:
        want = [i for i in range(len(t) - L + 1) if lit[t[i:i + L]] >= 2]
        got = [i for i, k in enumerate(keys) if hc[k] >= 2]
        assert got == want


def _brute_excise(docs: dict[int, str], L: int) -> pd.DataFrame:
    cnt = Counter()
    first = {}
    for did in sorted(docs):
        t = docs[did]
        for i in range(len(t) - L + 1):
            gm = t[i:i + L]
            cnt[gm] += 1
            first.setdefault(gm, (did, i))
    rows = []
    for did in sorted(docs):
        t = docs[did]
        rem = [i for i in range(len(t) - L + 1)
               if cnt[t[i:i + L]] >= 2 and first[t[i:i + L]] < (did, i)]
        ivs = []
        for o in rem:
            if ivs and o <= ivs[-1][1]:
                ivs[-1][1] = o + L
            else:
                ivs.append([o, o + L])
        pieces, pos = [], 0
        for s, e in ivs:
            pieces.append(t[pos:s])
            pos = e
        pieces.append(t[pos:])
        nt = "".join(pieces)
        rows.append({"doc_id": did, "new_text": nt,
                     "removed_chars": len(t) - len(nt)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("L", [8, 16])
def test_dup_span_excise_matches_brute_force(ray_session, L):
    import ray.data as rd

    from pcompress_ray.stages.dupspans import dup_span_excise

    docs = _planted_docs()
    want = _brute_excise(docs, L)
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))

    got_b = dup_span_excise(ds, L=L).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)

    # no duplicated L-gram may survive ACROSS the kept first occurrences?
    # (not guaranteed single-pass — Lee et al. semantics; but removal must
    # be monotone: total chars only shrink, first doc is untouched)
    assert (got_b["removed_chars"] >= 0).all()
    assert got_b.loc[got_b["doc_id"] == 0, "new_text"].iloc[0] == docs[0]

    got_s = dup_span_excise(ds, L=L, broadcast_limit=0,
                            n_parts=5).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want, check_dtype=False)


def test_excise_packing_guard():
    from pcompress_ray.stages.dupspans import _packed_pos

    with pytest.raises(ValueError):
        _packed_pos(np.array([1], np.int64), np.array([10**6], np.int64))


def test_winnow_select_density_and_determinism():
    from pcompress_ray.stages.dupspans import _winnow_select

    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    for w in (4, 8, 16):
        sel = _winnow_select(h, w)
        assert np.array_equal(sel, _winnow_select(h, w))
        assert np.all(np.diff(sel) > 0)
        # expected density 2/(w+1); allow generous slack
        frac = sel.size / h.size
        assert 0.5 * 2 / (w + 1) < frac < 2.5 * 2 / (w + 1), (w, frac)
    # shorter than one window -> single global min anchor
    assert _winnow_select(h[:3], 8).tolist() == [int(h[:3].argmin())]


@pytest.mark.parametrize("w", [4, 8])
def test_winnow_guarantee_on_planted_spans(ray_session, w):
    """Any shared span of length >= w + L - 1 must raise n_dup_anchors >= 1
    on BOTH copies — the winnowing detection guarantee."""
    import ray.data as rd

    from pcompress_ray.stages.dupspans import dup_span_anchors

    L = 8
    rng = np.random.default_rng(23)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"), dtype="<U1")

    def rand(n):
        return "".join(rng.choice(alpha, size=n))

    shared = rand(w + L - 1)          # exactly the guarantee threshold
    docs = {0: rand(60) + shared + rand(40),
            1: rand(25) + shared + rand(70),
            2: rand(120)}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}))
    got = dup_span_anchors(ds, L=L, w=w).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_dup_anchors"] >= 1
    assert got.loc[1, "n_dup_anchors"] >= 1
    # determinism across parallelism
    got2 = dup_span_anchors(ds.repartition(3), L=L,
                            w=w).to_pandas().set_index("doc_id")
    pd.testing.assert_frame_equal(got.sort_index(), got2.sort_index())


def _brute_cross_excise(a: dict[int, str], b_texts: list[str], L: int):
    bg = set()
    for t in b_texts:
        for i in range(len(t) - L + 1):
            bg.add(t[i:i + L])
    rows = []
    for did in sorted(a):
        t = a[did]
        rem = [i for i in range(len(t) - L + 1) if t[i:i + L] in bg]
        ivs = []
        for o in rem:
            if ivs and o <= ivs[-1][1]:
                ivs[-1][1] = o + L
            else:
                ivs.append([o, o + L])
        pieces, pos = [], 0
        for s, e in ivs:
            pieces.append(t[pos:s])
            pos = e
        pieces.append(t[pos:])
        nt = "".join(pieces)
        rows.append({"doc_id": did, "new_text": nt,
                     "removed_chars": len(t) - len(nt)})
    return pd.DataFrame(rows)


@pytest.mark.parametrize("L", [6, 12])
def test_cross_span_excise_matches_brute_force(ray_session, L):
    import ray.data as rd

    from pcompress_ray.stages.dupspans import cross_span_excise

    rng = np.random.default_rng(31)
    alpha = np.array(list("abcdefghijklmnop "), dtype="<U1")

    def rand(n):
        return "".join(rng.choice(alpha, size=n))

    bench = rand(40)                       # the "benchmark" passage
    b_texts = [bench, rand(50)]
    a = {0: rand(30) + bench + rand(20),   # contains the full passage
         1: rand(25) + bench[5:5 + L] + rand(40),  # one gram only
         2: rand(80),                      # clean
         3: "tiny"}                        # shorter than L
    want = _brute_cross_excise(a, b_texts, L)

    a_ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(a), "text": list(a.values())}))
    b_ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [100, 101], "text": b_texts}))

    got = cross_span_excise(a_ds, b_ds, L=L).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got_s = cross_span_excise(a_ds, b_ds, L=L, broadcast_limit=0,
                              n_parts=3).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want, check_dtype=False)

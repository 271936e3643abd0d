"""DSIR (Xie et al. 2023): fit/score kernels vs a pure-Python reference,
Gumbel resampling determinism, parallelism invariance, and the semantic
property the operator exists for — target-like documents outscore
non-target-like ones."""

from __future__ import annotations

import hashlib
import math
import re
import sys
from collections import Counter
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pcompress_ray.stages.dsir import (  # noqa: E402
    dsir_log_ratio_e6,
    dsir_resample,
    dsir_scores,
    fit_hashed_ngram_counts,
    gumbel_key_e6,
)
from pcompress_ray.stages.textstats import TOKEN_RE  # noqa: E402

_RE = re.compile(TOKEN_RE)
B = 8192


def _ref_ngrams(text: str) -> list[str]:
    toks = _RE.findall((text or "").lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:16], 16) % B


def _ref_counts(texts) -> np.ndarray:
    c = Counter(_ref_bucket(g) for x in texts for g in _ref_ngrams(x))
    out = np.zeros(B, np.int64)
    for b, n in c.items():
        out[b] = n
    return out


def _corpus():
    # "target" style: science-ish vocab; "raw" mixes in boilerplate spam
    rng = np.random.default_rng(5)
    sci = [f"atom{i}" for i in range(50)] + ["energy", "mass", "field"]
    spam = [f"buy{i}" for i in range(50)] + ["cheap", "click", "now"]
    texts, styles = [], []
    for i in range(60):
        style = "sci" if i % 3 == 0 else "spam"
        vocab = sci if style == "sci" else spam
        texts.append(" ".join(rng.choice(vocab, 40)))
        styles.append(style)
    texts[7] = ""          # zero-token doc
    styles[7] = "empty"
    return texts, styles


def _ds(texts, blocks=4):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t).repartition(blocks)


def test_fit_counts_match_reference(ray_session):
    texts, _ = _corpus()
    got = fit_hashed_ngram_counts(_ds(texts))
    np.testing.assert_array_equal(got, _ref_counts(texts))


def test_scores_match_reference_and_semantics(ray_session):
    texts, styles = _corpus()
    # target = every 3rd doc (the sci docs)
    tgt = [x for i, x in enumerate(texts) if i % 3 == 0]
    llr = dsir_log_ratio_e6(_ref_counts(tgt), _ref_counts(texts))

    # quantized llr matches a scalar-math reference
    nt = _ref_counts(tgt)
    nr = _ref_counts(texts)
    for b in (0, 17, 4091, B - 1):
        want = math.floor(1e6 * (
            math.log((nt[b] + 1.0) / (nt.sum() + B))
            - math.log((nr[b] + 1.0) / (nr.sum() + B))) + 0.5)
        assert llr[b] == want

    out = dsir_scores(_ds(texts), llr).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = {i: sum(int(llr[_ref_bucket(g)]) for g in _ref_ngrams(x))
           for i, x in enumerate(texts)}
    assert out["score_e6"].tolist() == [ref[i] for i in range(len(texts))]
    assert out.loc[7, "n_ngrams"] == 0 and out.loc[7, "score_e6"] == 0

    # semantics: every sci doc outscores every spam doc
    sc = out["score_e6"].to_numpy()
    sci = [sc[i] for i, s in enumerate(styles) if s == "sci"]
    spam = [sc[i] for i, s in enumerate(styles) if s == "spam"]
    assert min(sci) > max(spam)


def test_parallelism_invariance(ray_session):
    texts, _ = _corpus()
    tgt = [x for i, x in enumerate(texts) if i % 3 == 0]
    llr = dsir_log_ratio_e6(_ref_counts(tgt), _ref_counts(texts))
    outs = []
    for blocks in (1, 7):
        sel = dsir_resample(dsir_scores(_ds(texts, blocks), llr),
                            k=10, seed=3).to_pandas()
        outs.append(sel[["doc_id", "score_e6", "key_e6"]]
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert len(outs[0]) == 10
    # keys match the scalar formula
    ids = outs[0]["doc_id"].to_numpy()
    sc = outs[0]["score_e6"].to_numpy()
    np.testing.assert_array_equal(
        outs[0]["key_e6"].to_numpy(), gumbel_key_e6(ids, sc, seed=3))


def test_gumbel_bias_toward_high_weights():
    # Gumbel-max over many seeds selects the high-weight id most often
    ids = np.arange(20)
    score = np.zeros(20, np.int64)
    score[13] = 3_000_000  # e^3 ~ 20x likelier than the rest
    wins = Counter(int(ids[np.argmax(gumbel_key_e6(ids, score, seed=s))])
                   for s in range(200))
    # e^3/(e^3+19) ~ 0.51 win probability -> ~103 of 200 expected; allow
    # 6 sigma slack while still far above the uniform expectation of 10
    assert wins.most_common(1)[0][0] == 13
    assert wins[13] > 60


def test_memo_cap_and_unigram_only():
    """The per-worker md5 memo caches UNIGRAMS only and stops growing at
    _MEMO_CAP — a long-lived worker on an unbounded bigram vocabulary
    can no longer OOM (ADVICE r04); buckets are identical either way."""
    from pcompress_ray.stages.dsir import _MEMO_CAP, _batch_buckets

    texts = pa.array(["alpha beta gamma", "beta gamma delta"], pa.string())
    memo = {}
    b1, s1, n1 = _batch_buckets(texts, B, memo)
    # only the 4 distinct unigrams are cached — never the 4 bigrams
    assert set(memo) == {"alpha", "beta", "gamma", "delta"}
    # a full memo stops growing but still returns correct buckets
    full = dict.fromkeys((f"f{i}" for i in range(_MEMO_CAP)), 0)
    b2, s2, n2 = _batch_buckets(texts, B, full)
    assert len(full) == _MEMO_CAP          # no insert past the cap
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(n1, n2)
    # and every bucket matches the scalar md5 reference
    exp = []
    for t in texts.to_pylist():
        exp.extend(_ref_bucket(g) for g in _ref_ngrams(t))
    assert sorted(b1.tolist()) == sorted(exp)


def test_tokenize_alnum_matches_re_reference():
    from pcompress_ray.stages.textstats import tokenize_alnum

    texts = ["A-B c_d 42x", "", None, "  lots   of\tspace ", "ALL CAPS 9"]
    doc, words, n_docs = tokenize_alnum(pa.array(texts, pa.string()))
    assert n_docs == len(texts)
    got = [[] for _ in texts]
    for d, w in zip(doc, words):
        got[d].append(w)
    exp = [_RE.findall((t or "").lower()) for t in texts]
    assert got == exp


def test_tokenize_alnum_matches_duckdb_on_unicode():
    """Hypothesis: the Arrow tokenizer agrees with the DuckDB oracles'
    regexp_extract_all(lower(x), '[a-z0-9]+') on arbitrary unicode —
    including SpecialCasing chars (U+0130, K, ß) where Python's
    str.lower() diverges. This pins the kernel to the ORACLE side."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pcompress_ray.stages.textstats import tokenize_alnum

    alphabet = st.sampled_from(list("aZ09 .\n\t-_İKßΣüé中🙂"))

    @settings(max_examples=40, deadline=None)
    @given(texts=st.lists(st.text(alphabet, max_size=40), min_size=1,
                          max_size=6))
    def run(texts):
        doc, words, n_docs = tokenize_alnum(pa.array(texts, pa.string()))
        got = [[] for _ in texts]
        for d, w in zip(doc, words):
            got[d].append(w)
        con = duckdb.connect()
        exp = [con.execute(
            "select regexp_extract_all(lower(?), '[a-z0-9]+')",
            [t]).fetchone()[0] for t in texts]
        con.close()
        assert got == exp

    run()

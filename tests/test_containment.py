"""Planted-fixture oracle for the n-gram containment score mode of
ngram_jaccard_pairs: an excerpt (short doc fully quoted inside a long one)
must score ~1.0 on containment while staying far below the Jaccard
threshold — the asymmetric-size dup case Jaccard misses."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _words(seed: int, n: int) -> list[str]:
    rng = np.random.default_rng(seed)
    return [f"w{int(x)}" for x in rng.integers(0, 5000, size=n)]


def test_containment_detects_excerpt_jaccard_does_not():
    import ray.data as rd

    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    long_doc = _words(1, 400)
    excerpt = long_doc[100:140]            # 40 tokens quoted verbatim
    other = _words(2, 300)                 # unrelated
    docs = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([" ".join(long_doc), " ".join(excerpt),
                          " ".join(other)]),
    })
    ds = rd.from_arrow(docs).repartition(2)

    cont = ngram_jaccard_pairs(ds, k=5, threshold=0.8,
                               score="containment").to_pandas()
    cont = cont.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    # exactly the (long, excerpt) pair, containment == 1.0
    assert list(zip(cont["doc_a"], cont["doc_b"])) == [(10, 11)]
    assert cont["containment"].iloc[0] == 1.0
    # min_sz is the excerpt's distinct-shingle count (36 positions, all
    # distinct w.h.p. with these random tokens)
    assert int(cont["min_sz"].iloc[0]) == 36
    assert int(cont["inter"].iloc[0]) == 36

    # the same pair is invisible to Jaccard at 0.5: 36/ (~396+36-36) << 0.5
    jac = ngram_jaccard_pairs(ds, k=5, threshold=0.5,
                              score="jaccard").to_pandas()
    assert len(jac) == 0


def test_containment_counts_match_python_sets():
    import ray.data as rd

    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    texts = ["a b c d e f g", "c d e f g h a b", "x y z a b c d q"]

    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}

    sets = [sh(t) for t in texts]
    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array(texts)})
    out = ngram_jaccard_pairs(rd.from_arrow(docs).repartition(2), k=5,
                              threshold=0.0, score="containment").to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): (int(r.inter), int(r.min_sz))
           for r in out.itertuples()}
    for a in range(3):
        for b in range(a + 1, 3):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
            else:
                assert got[(a, b)] == (inter, min(len(sets[a]),
                                                  len(sets[b])))


def test_bad_score_raises():
    import pytest
    import ray.data as rd

    from pcompress_ray.stages.candidates import ngram_jaccard_pairs

    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["a b c d e"])})
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(rd.from_arrow(docs), score="overlap")

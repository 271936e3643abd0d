"""segment_dedup_rewrite: planted-duplicate semantics.

Oracle model: corpus-wide keep-first at (doc_id, seg_no) order over fixed
w-token windows, reassembly preserves within-doc segment order, fully-
duplicate docs emit an empty rewrite (the backward-reference analog of
rabin/rabin_dedup.c:1606-1617 re-emitting only first occurrences).
"""
import numpy as np
import pandas as pd
import pytest

from pcompress_ray.stages.rewrite import segment_dedup_rewrite

A, B, C, D = "a1 a2 a3", "b1 b2 b3", "c1 c2 c3", "d1 d2 d3"


def _run(docs: pd.DataFrame, w: int = 3) -> pd.DataFrame:
    import ray.data as rd

    out = segment_dedup_rewrite(rd.from_pandas(docs), w=w, n_parts=4)
    return (out.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_planted_keep_first(ray_session):
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [f"{A} {B}",      # both first occurrences -> unchanged
                 f"{B} {C}",      # B dup of doc 0 -> only C survives
                 A,               # entirely dup -> empty rewrite
                 f"{D} {D}"],     # intra-doc dup -> D kept once
    })
    out = _run(docs)
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    assert out["new_text"].tolist() == [f"{A} {B}", C, "", D]
    assert out["n_segs"].tolist() == [2, 2, 1, 2]
    assert out["n_kept"].tolist() == [2, 1, 0, 1]


def test_short_tail_window_and_order(ray_session):
    # last window shorter than w is its own segment; doc order preserved
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": [f"{A} zz", f"{A} zz"]})
    out = _run(docs)
    assert out["new_text"].tolist() == [f"{A} zz", ""]
    assert out["n_segs"].tolist() == [2, 2]


def test_matches_bruteforce_oracle(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(12)]
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, rng.integers(1, 25)))
                 for _ in range(40)],
    })
    w = 4
    seen: set[str] = set()
    want = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        tk = txt.split()
        kept = []
        for s in range(0, len(tk), w):
            seg = " ".join(tk[s:s + w])
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        want[did] = " ".join(kept)
    out = _run(docs, w=w)
    assert out["new_text"].tolist() == [want[d] for d in out["doc_id"]]

"""substring_excise == pure-Python splice oracle over the planted-span
corpus; interval-union edge cases pinned directly."""
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pcompress_ray.config import PipelineConfig
from pcompress_ray.stages.suffix import merge_intervals, substring_excise


def test_merge_intervals_cases():
    s, e = merge_intervals(np.array([5, 0, 3]), np.array([9, 4, 7]))
    assert s.tolist() == [0] and e.tolist() == [9]
    # containment + touching ([0,4) and [4,6) merge: start > cummax opens)
    s, e = merge_intervals(np.array([0, 1, 4]), np.array([4, 2, 6]))
    assert s.tolist() == [0] and e.tolist() == [6]
    s, e = merge_intervals(np.array([10, 0]), np.array([12, 2]))
    assert s.tolist() == [0, 10] and e.tolist() == [2, 12]


def _python_excise(spans: pd.DataFrame, texts: list[bytes], min_len: int):
    out = {}
    for rank, txt in enumerate(texts):
        rows = spans[(spans.b == rank) & (spans.span_len >= min_len)]
        ivs = sorted(zip(rows.b_off.tolist(),
                         (rows.b_off + rows.span_len).tolist()))
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        pieces, pos = [], 0
        for s, e in merged:
            pieces.append(txt[pos:s])
            pos = e
        pieces.append(txt[pos:])
        body = b"".join(pieces)
        out[rank] = (len(merged), len(txt) - len(body),
                     hashlib.sha256(body).hexdigest())
    return out


def test_excise_matches_python_oracle(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.pipelines.dedup import build_signatures, union_edges
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.exact import chunk_exact_edges, doc_exact_edges
    from pcompress_ray.stages.suffix import substring_verify

    cfg = PipelineConfig()
    pages, _, _ = make_corpus(120, 42, with_oracle=False)
    pages = pages.append_column(
        "rank", pa.array(np.arange(len(pages["url"]), dtype=np.int64)))
    ds = rd.from_arrow(pages).repartition(4)
    sig = build_signatures(ds, cfg).materialize()
    edges = union_edges(doc_exact_edges(sig), chunk_exact_edges(sig, cfg),
                        cfg=cfg)
    spans = substring_verify(edges, ds, cfg).materialize()
    sdf = spans.to_pandas()
    assert len(sdf) > 0

    got = (substring_excise(spans, ds, min_len=cfg.substring_min_bytes)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    texts = [(t or "").encode() for t in pages["text"].to_pylist()]
    want = _python_excise(sdf, texts, cfg.substring_min_bytes)

    assert len(got) == len(texts)
    assert got["rank"].tolist() == list(range(len(texts)))
    for r in got.itertuples():
        n, b, sha = want[int(r.rank)]
        assert (r.cut_spans, r.cut_bytes, r.text_sha256) == (n, b, sha), \
            f"rank {r.rank}"
    # the rewrite actually cut something
    assert got["cut_bytes"].sum() > 0


def test_excise_blocking_invariance(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()

    texts = ["A" * 40 + "shared span payload " * 200 + "B" * 40,
             "C" * 64 + "shared span payload " * 200 + "D" * 64,
             "totally unique document body " * 50]
    spans = pd.DataFrame({"a": [0], "b": [1], "a_off": [40], "b_off": [64],
                          "span_len": [len("shared span payload " * 200)],
                          "lcs_bytes": [len("shared span payload " * 200)]})
    pages = pa.table({"rank": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    outs = []
    for parts in (1, 3):
        res = substring_excise(
            rd.from_pandas(spans).repartition(parts),
            rd.from_arrow(pages).repartition(parts), min_len=100)
        outs.append(res.to_pandas().sort_values("rank")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exp1 = hashlib.sha256(("C" * 64 + "D" * 64).encode()).hexdigest()
    assert outs[0].loc[1, "text_sha256"] == exp1
    assert outs[0].loc[0, "cut_spans"] == 0
    assert outs[0].loc[2, "cut_spans"] == 0

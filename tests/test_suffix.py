"""Rolling-hash LCS, shared-span coalescing + SimHash candidate tests."""

import numpy as np
import pyarrow as pa

from pcompress_ray.config import PipelineConfig
from pcompress_ray.stages.suffix import (lcs_with_offsets,
                                         longest_common_substring,
                                         shared_spans)


def test_lcs_basic():
    assert longest_common_substring(b"hello world", b"say hello there") == 6  # "hello "
    assert longest_common_substring(b"abc", b"xyz") == 0
    assert longest_common_substring(b"", b"abc") == 0
    assert longest_common_substring(b"abcabc", b"abcabc") == 6


def test_lcs_planted_span():
    rng = np.random.default_rng(3)
    span = bytes(rng.integers(65, 91, 5000, dtype=np.uint8))
    a = bytes(rng.integers(97, 123, 2000, dtype=np.uint8)) + span
    b = span + bytes(rng.integers(97, 123, 1500, dtype=np.uint8))
    lcs, a_off, b_off = lcs_with_offsets(a, b)
    assert lcs == 5000
    assert (a_off, b_off) == (2000, 0)
    assert a[a_off:a_off + lcs] == b[b_off:b_off + lcs]


def test_lcs_offsets_brute_force():
    """Offsets + length match an O(n*m) dynamic-programming oracle."""
    rng = np.random.default_rng(11)
    for trial in range(10):
        a = bytes(rng.integers(97, 101, 60, dtype=np.uint8))  # 4-letter alphabet
        b = bytes(rng.integers(97, 101, 50, dtype=np.uint8))
        best = 0
        dp = np.zeros((len(a) + 1, len(b) + 1), dtype=np.int32)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    dp[i, j] = dp[i - 1, j - 1] + 1
                    best = max(best, int(dp[i, j]))
        lcs, a_off, b_off = lcs_with_offsets(a, b)
        assert lcs == best
        assert a[a_off:a_off + lcs] == b[b_off:b_off + lcs]


def test_shared_spans_planted_offsets():
    """Two planted spans at known offsets are recovered exactly (coalesced
    chunk anchors + byte extension -> maximal spans)."""
    rng = np.random.default_rng(7)

    def rand(n):
        return bytes(rng.integers(33, 127, n, dtype=np.uint8))

    span1, span2 = rand(9000), rand(6000)
    a = rand(3000) + span1 + rand(2500) + span2 + rand(1000)
    b = rand(500) + span2 + rand(4000) + span1 + rand(800)
    spans = shared_spans(a, b, 1024, 4096, min_span=2048)
    # each planted span must be covered by one reported maximal span
    expect = [(3000, 4500 + 6000, 9000),   # span1: a_off, b_off, len
              (3000 + 9000 + 2500, 500, 6000)]
    for e_ao, e_bo, e_len in expect:
        hit = [s for s in spans
               if s[0] <= e_ao and s[1] <= e_bo
               and s[0] + s[2] >= e_ao + e_len and s[1] + s[2] >= e_bo + e_len
               # same alignment diagonal as the plant
               and s[0] - s[1] == e_ao - e_bo]
        assert hit, (spans, (e_ao, e_bo, e_len))
        # spans are byte-verified maximal shared runs
        ao, bo, ln = hit[0]
        assert a[ao:ao + ln] == b[bo:bo + ln]


def test_substring_verify_spans_byte_exact(ray_session):
    """End-to-end: every (a_off, b_off, span_len) row substring_verify emits
    is a byte-identical shared run between the two documents, and the
    pair's LCS span appears among the rows."""
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.pipelines.dedup import dedup_pipeline
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.suffix import substring_verify

    cfg = PipelineConfig()
    pages, opairs, _ = make_corpus(120, 42)
    pages = pages.append_column(
        "rank", pa.array(np.arange(len(pages["url"]), dtype=np.int64)))
    ds = rd.from_arrow(pages).repartition(4)
    res = dedup_pipeline(ds, cfg, compute_pairs=False)
    spans = substring_verify(res.edges, ds, cfg).to_pandas()
    assert len(spans) > 0
    texts = [(t or "").encode() for t in pages["text"].to_pylist()]
    for row in spans.itertuples():
        da, db = texts[int(row.a)], texts[int(row.b)]
        assert row.span_len >= 1
        assert da[row.a_off:row.a_off + row.span_len] == \
            db[row.b_off:row.b_off + row.span_len]
        assert row.lcs_bytes >= cfg.substring_min_bytes
    # per-pair max span == the pair's reported LCS
    gmax = spans.groupby(["a", "b"]).agg(
        mx=("span_len", "max"), lcs=("lcs_bytes", "first"))
    assert (gmax.mx >= gmax.lcs).all()
    # planted substring pairs that the edge layer flagged are all resolved
    op = opairs.to_pandas()
    sub = set((min(a, b), max(a, b)) for a, b in
              zip(op[op.kind == "substring"].rank_a,
                  op[op.kind == "substring"].rank_b))
    got_pairs = set(zip(spans.a.astype(int), spans.b.astype(int)))
    assert len(sub & got_pairs) / len(sub) >= 0.9


def test_shared_spans_identical_docs():
    rng = np.random.default_rng(9)
    doc = bytes(rng.integers(33, 127, 20000, dtype=np.uint8))
    spans = shared_spans(doc, doc, 1024, 4096)
    assert (0, 0, len(doc)) in spans


def test_simhash_candidates_find_neardups(ray_session):
    import ray.data as rd

    import pcompress_ray

    pcompress_ray.register_for_ray()
    from pcompress_ray.pipelines.dedup import build_signatures
    from pcompress_ray.sources.corpus import make_corpus
    from pcompress_ray.stages.candidates import simhash_candidates

    cfg = PipelineConfig()
    pages, opairs, _ = make_corpus(100, 42)
    pages = pages.append_column("rank", pa.array(np.arange(100), pa.int64()))
    sig = build_signatures(rd.from_arrow(pages).repartition(4), cfg).materialize()
    got = simhash_candidates(sig, cfg).to_pandas()
    gotset = set(zip(got.a.astype(int), got.b.astype(int)))
    op = opairs.to_pandas()
    # exact dups (simhash identical) must all be found
    ex = op[op.kind == "exact"]
    found = sum(((min(a, b), max(a, b)) in gotset)
                for a, b in zip(ex.rank_a, ex.rank_b))
    assert found == len(ex)
    # the very-high-J near dups (0.95 band) should mostly appear
    hi = op[(op.kind == "near") & (op.jaccard >= 0.93)]
    found_hi = sum(((min(a, b), max(a, b)) in gotset)
                   for a, b in zip(hi.rank_a, hi.rank_b))
    assert found_hi >= len(hi) * 0.5

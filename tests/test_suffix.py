"""Suffix-automaton LCS + SimHash candidate tests."""

import numpy as np
import pyarrow as pa

from pcompress_ray.config import PipelineConfig
from pcompress_ray.stages.suffix import longest_common_substring


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
    assert longest_common_substring(a, b) == 5000


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

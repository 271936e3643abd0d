"""BPE trainer/encoder: Sennrich-style fixed vector, determinism across
parallelism, encode == training fixed point, distributed == local."""
import numpy as np
import pandas as pd
import pytest

from pcompress_ray.stages.bpe import (
    batch_word_counts, encode_word, pretokenize, train_bpe, word_vocab)


def test_train_bpe_fixed_vector():
    # the classic example family (Sennrich et al. 2016 §3.2): 'es' then
    # 'est' dominate, weighted by word counts.
    words = ["lowest", "newest", "widest", "low", "lower", "new"]
    counts = [5, 6, 3, 7, 2, 4]
    merges = train_bpe(words, counts, n_merges=4)
    assert merges[0][:2] == ("e", "s")          # es: 5+6+3 = 14
    assert merges[0][2] == 14
    assert merges[1][:2] == ("es", "t")         # est: 14
    # next best: 'lo' (5+7+2=14) vs 'ne'(6+4=10) vs 'w'+'est'... lo wins
    assert merges[2][:2] == ("l", "o")
    assert merges[2][2] == 14


def test_train_bpe_tie_break_deterministic():
    # 'ab' and 'cd' both count 3 -> lexicographically smallest pair wins
    merges = train_bpe(["ab", "cd"], [3, 3], n_merges=1)
    assert merges[0][:2] == ("a", "b")


def test_encode_word_matches_training_fixed_point():
    words = ["lowest", "newest", "widest", "low", "lower", "new", "banana"]
    counts = [5, 6, 3, 7, 2, 4, 9]
    merges = train_bpe(words, counts, n_merges=12)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    # re-deriving each training word's final sequence must reproduce the
    # trainer's end state: replay the merges on the word directly.
    for w in words:
        seq = list(w)
        for l, r, _ in merges:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == l and seq[i + 1] == r:
                    seq[i:i + 2] = [l + r]
                else:
                    i += 1
        assert encode_word(w, ranks) == seq, w


def test_pretokenize():
    assert pretokenize("Hello, World! x2") == ["hello", "world", "x2"]


def test_word_vocab_distributed_equals_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vocab_pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [" ".join(rng.choice(vocab_pool, size=rng.integers(3, 30)))
             for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})

    from collections import Counter
    want = Counter()
    for t in texts:
        want.update(pretokenize(t))

    got = word_vocab(rd.from_pandas(df), max_words=5, n_parts=7)
    exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(got["word"], got["cnt"])) == exp

    # different parallelism, same result
    got2 = word_vocab(rd.from_pandas(df).repartition(11), max_words=5,
                      n_parts=3)
    pd.testing.assert_frame_equal(got, got2)


def test_bpe_token_counts_distributed(ray_session):
    import ray
    import ray.data as rd

    from pcompress_ray.stages.bpe import bpe_token_counts

    texts = ["the lowest low", "newest of the new", "", "widest widest"]
    df = pd.DataFrame({"doc_id": np.arange(4), "text": texts})
    vocab = word_vocab(rd.from_pandas(df), max_words=100)
    merges = train_bpe(vocab["word"].tolist(), vocab["cnt"].tolist(), 8)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    ref = ray.put([(l, r) for l, r, _ in merges])
    got = bpe_token_counts(rd.from_pandas(df), ref).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for j, t in enumerate(texts):
        words = pretokenize(t)
        assert got.loc[j, "n_words"] == len(words)
        assert got.loc[j, "n_bpe_tokens"] == sum(
            len(encode_word(w, ranks)) for w in words)


def test_batch_word_counts_schema_empty():
    import pyarrow as pa
    out = batch_word_counts(pa.table({"doc_id": pa.array([], pa.int64()),
                                      "text": pa.array([], pa.string())}))
    assert out.schema.field("cnt").type == pa.int64()
    assert len(out) == 0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


@pytest.mark.skipif(not _HYP, reason="hypothesis unavailable")
@settings(max_examples=60, deadline=None)
@given(words=st.lists(st.text(alphabet="abc", min_size=1, max_size=10),
                      min_size=1, max_size=12),
       counts=st.lists(st.integers(min_value=1, max_value=9), min_size=12,
                       max_size=12),
       probe=st.text(alphabet="abc", min_size=0, max_size=14),
       n_merges=st.integers(min_value=0, max_value=15))
def test_encode_equals_replay_property(words, counts, probe, n_merges):
    """encode_word (min-rank-first) == replaying merges in rank order, for
    ARBITRARY words — the classic BPE equivalence (a pair of existing
    tokens can never be newly created by a later merge)."""
    merges = train_bpe(words, counts[:len(words)], n_merges)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    seq = list(probe)
    for l, r, _ in merges:
        i = 0
        while i < len(seq) - 1:
            if seq[i] == l and seq[i + 1] == r:
                seq[i:i + 2] = [l + r]
            else:
                i += 1
    assert encode_word(probe, ranks) == seq

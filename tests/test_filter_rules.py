"""heuristic_filter_batch: each rule bit fires on a crafted doc."""
import pyarrow as pa

from pcompress_ray.stages.filter_rules import heuristic_filter_batch

GOOD = " ".join(["the", "of", "and", "to"] * 3 + [f"word{i}" for i in range(20)])


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = heuristic_filter_batch(t)
    return (out["fail_mask"].to_pylist(), out["keep"].to_pylist(),
            out["n_tokens"].to_pylist())


def test_each_rule_bit():
    texts = [
        GOOD,                                   # passes everything
        "the of and to in",                     # bit 0: too few words
        " ".join(["x" * 20] * 25) + " the",     # bit 2: mean len > 12
        "the " * 30,                            # bit 3: top-token dominance
        " ".join(f"w{i}" for i in range(30)),   # bit 4: no stopword
        GOOD + " lorem",                        # bit 5: blocklist hit
        None,                                   # empty: min_words + stopword
    ]
    mask, keep, n_tok = _run(texts)
    assert mask[0] == 0 and keep[0] == 1
    assert mask[1] & 1
    assert mask[2] & 4
    assert mask[3] & 8
    assert mask[4] & 16
    assert mask[5] == 32 and keep[5] == 0
    assert mask[6] & 1 and mask[6] & 16 and n_tok[6] == 0
    assert all(k == 0 for k in keep[1:])


def test_max_words_bit():
    mask, keep, _ = _run([GOOD + " the" * 6000])
    assert mask[0] & 2 and keep[0] == 0

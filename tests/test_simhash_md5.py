"""md5-derived SimHash: kernel vs pure-Python reference, and banded-pairs
exactness vs brute force (the pigeonhole guarantee, uncapped buckets)."""

from __future__ import annotations

import hashlib
import itertools
import re
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __ray_entry__ as e  # noqa: E402
from pcompress_ray.stages.textstats import TOKEN_RE  # noqa: E402

_RE = re.compile(TOKEN_RE)


def _ref_simhash(text: str) -> int | None:
    toks = set(_RE.findall((text or "").lower()))
    if not toks:
        return None
    sums = [0] * 64
    for tok in toks:
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:16], 16)
        for b in range(64):
            sums[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(64) if sums[b] >= 0)


def _corpus(tmp_path: Path) -> tuple[str, list[str]]:
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(400)]
    base = " ".join(rng.choice(vocab, 120))
    texts = [base]
    # near-identical variants (1-3 token edits) -> small hamming distances
    for k in (1, 2, 3, 8):
        words = base.split()
        for j in range(k):
            words[(7 * j + 3) % len(words)] = f"alt{k}_{j}"
        texts.append(" ".join(words))
    texts.append(base)                       # exact dup -> hamming 0
    texts += [" ".join(rng.choice(vocab, 60)) for _ in range(20)]
    texts.append("")                         # zero-token doc: no row
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path), texts


def test_fingerprint_matches_pure_python(ray_session, tmp_path):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    sf, texts = _corpus(tmp_path)
    out = e.queries()["simhash_fingerprint"](sf)
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("doc_id")
    for i, txt in enumerate(texts):
        ref = _ref_simhash(txt)
        if ref is None:
            assert i not in df.index
        else:
            assert df.loc[i, "simhash"] == format(ref, "016x")


def test_banded_pairs_equal_brute_force(ray_session, tmp_path):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    sf, texts = _corpus(tmp_path)
    fps = {i: _ref_simhash(t) for i, t in enumerate(texts)
           if _ref_simhash(t) is not None}
    brute = {(a, b) for a, b in itertools.combinations(sorted(fps), 2)
             if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert any(fps[a] == fps[b] for a, b in brute)   # planted exact dup
    out = e.queries()["simhash_hamming_pairs"](sf)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = {(int(r.a), int(r.b)) for r in df.itertuples()}
    assert got == brute

"""Normalized-exact dedup tier: planted case/whitespace variants must
collapse to one canonical while byte-exact dedup keeps them apart."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __ray_entry__ as e  # noqa: E402


def _write_corpus(tmp_path: Path) -> str:
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "Hello  World\n",          # canonical (min doc_id)
            "hello world",             # case + whitespace variant
            "HELLO\tWORLD",            # tab variant
            " hello world ",           # leading/trailing variant
            "a genuinely different document",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_norm_dedup_collapses_variants(ray_session, tmp_path):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    out = e.queries()["norm_text_dedup"](_write_corpus(tmp_path))
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == [1, 2, 3, 4, 5]
    # docs 1-4 normalize identically -> one group, canonical = min id
    assert list(df["canonical_doc_id"]) == [1, 1, 1, 1, 5]
    assert df["norm_md5"].nunique() == 2
    # byte-exact dedup on the same corpus keeps all five apart
    ex = e.queries()["exact_dup_docs"](_write_corpus(tmp_path))
    exdf = ex.to_pandas() if hasattr(ex, "to_pandas") else ex
    assert exdf["text_md5"].nunique() == 5

"""In-pytest replica of the driver's correctness gate for the newest
oracle-checked queries, at sf0.001 (fast). The full gate over every query
runs via tools/check_queries.py at sf0.01; this keeps the most recently
added oracles from regressing silently between gate runs."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"

NEW_ORACLED = ["lang_id", "dup_gain_by_source", "corpus_sample",
               "event_gaps", "user_running_value", "q3_top_orders",
               "user_first_last"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for p in Path(SF_DIR).glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


@pytest.mark.parametrize("name", NEW_ORACLED)
def test_query_matches_oracle(ray_session, name):
    import pcompress_ray

    pcompress_ray.register_for_ray()
    import __ray_entry__ as e

    got = e.queries()[name](SF_DIR)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = _oracle(e.oracle_sql()[name])

    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)

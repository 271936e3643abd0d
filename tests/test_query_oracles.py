"""In-pytest replica of the driver's correctness gate: EVERY oracle-checked
query at sf0.001 (fast), including the dtype-family guard the driver's
value-hash implies (int64 2059 vs float64 2059.0 hash differently, so
`check_dtype=False` alone is NOT enough — this exact bug class shipped in
rounds 1 AND 2 via DuckDB HUGEINT window sums arriving as float64)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __ray_entry__ as e  # noqa: E402  (no ray.init at import time)

SF_DIR = "/root/testdata/sf0.001"

ORACLED = sorted(e.oracle_sql().keys())


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for p in Path(SF_DIR).glob("*.parquet"):
        con.sql(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


def _family(dtype) -> str:
    """Dtype family as the driver's value-hash would distinguish it."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "str"


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, name):
    import pcompress_ray

    pcompress_ray.register_for_ray()

    got = e.queries()[name](SF_DIR)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
    want = _oracle(e.oracle_sql()[name])

    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    fams_g = [_family(g[c].dtype) for c in cols]
    fams_w = [_family(w[c].dtype) for c in cols]
    assert fams_g == fams_w, (
        f"dtype-family drift (driver hash would mismatch): "
        f"got={list(zip(cols, fams_g))} want={list(zip(cols, fams_w))}"
    )
    pd.testing.assert_frame_equal(g, w, check_dtype=False)

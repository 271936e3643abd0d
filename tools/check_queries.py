"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf dir and compare to oracle_sql() via DuckDB (row count + schema
+ order-insensitive value equality). Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize WITHIN a dtype family only (int widths → int64, floats
    rounded). Cross-family drift (int64 vs float64 — e.g. DuckDB HUGEINT
    sums arriving as float64) is deliberately NOT masked: the driver's
    value-hash is dtype-sensitive (2059 != 2059.0), so the dtype check in
    main() must see it."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6).astype(np.float64)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype(np.uint64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, "
                  f"cols={list(got.columns)} ({dt:.1f}s)")
            continue
        want = canon(con.sql(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWCOUNT got={len(got)} want={len(want)}"
        elif [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            status = (f"DTYPE MISMATCH got={[str(t) for t in got.dtypes]} "
                      f"want={[str(t) for t in want.dtypes]}")
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, atol=1e-9)
            except AssertionError as ex:
                status = f"VALUES differ: {str(ex)[:300]}"
        flag = "OK  " if status == "OK" else "FAIL"
        print(f"[{flag}] {name}: {len(got)} rows ({dt:.1f}s) {'' if status=='OK' else status}")
        if status != "OK":
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Driver-style correctness check: run each queries() entry and its
oracle_sql() side-by-side, compare row count, column names, and
order-insensitive values. Mirrors what the graft driver does at sf0.01.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame):
    """Returns (canonical df, {col: dtype-kind}). The driver hashes raw
    values, so a float64 oracle vs int64 engine column fails there even when
    the values are numerically equal (DuckDB sum(BIGINT)->HUGEINT->float64).
    We record dtype *kind* pre-coercion and compare kinds separately."""
    df = df[sorted(df.columns)].copy()
    kinds = {c: df[c].dtype.kind for c in df.columns}
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True), kinds


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res, res_kinds = canon(to_pandas(fn(sf)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(res)} rows, {dt:.1f}s)")
            continue
        try:
            oracle, ora_kinds = canon(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if len(res) != len(oracle):
            problems.append(f"rows {len(res)} vs {len(oracle)}")
        if list(res.columns) != list(oracle.columns):
            problems.append(f"cols {list(res.columns)} vs {list(oracle.columns)}")
        else:
            mism = [c for c in res.columns
                    if {res_kinds[c], ora_kinds[c]} == {"i", "f"}
                    or {res_kinds[c], ora_kinds[c]} == {"u", "f"}]
            if mism:
                problems.append(f"dtype-kind int/float mismatch (driver hash "
                                f"would fail): {mism}")
        if not problems:
            if not res.equals(oracle):
                # tolerate dtype-representation diffs, compare as values
                try:
                    pd.testing.assert_frame_equal(res, oracle, check_dtype=False,
                                                  rtol=0, atol=0)
                except AssertionError as ex:
                    problems.append(f"values: {str(ex).splitlines()[-1]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            print("  ray   :", res.head(3).to_dict("records"))
            print("  oracle:", oracle.head(3).to_dict("records"))
            failures += 1
        else:
            print(f"PASS {name} ({len(res)} rows, {dt:.1f}s)")
    print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

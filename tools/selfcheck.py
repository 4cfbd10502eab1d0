#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each query result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: row count, column names, and values
(columns sorted by name, rows sorted by all columns — mirroring the
driver's "sorts columns by name before hashing" contract, plus a row
sort so physical order never matters here).
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
                isinstance(v, int) for v in df[c].dropna().head(5)):
            try:
                df[c] = df[c].astype("int64")
            except (ValueError, TypeError, OverflowError):
                pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result written")
            failures += 1
            continue
        got = canon(pd.read_parquet(res_dir))
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        mismatched = []
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                ok = np.allclose(a.fillna(np.nan), b.fillna(np.nan),
                                 rtol=0, atol=0, equal_nan=True)
                exact = ok
            else:
                exact = a.astype(str).equals(b.astype(str))
            if not exact:
                mismatched.append(c)
        if mismatched:
            print(f"FAIL {name}: value mismatch in {mismatched}")
            for c in mismatched[:2]:
                diff = got[c].astype(str) != want[c].astype(str)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"   row {i}: got={got[c][i]!r} want={want[c][i]!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # queries without oracle → rows-only
    import pyarrow.parquet  # noqa
    for res_dir in sorted(Path(out_dir).iterdir()):
        if res_dir.is_dir() and res_dir.name not in oracle:
            n = len(pd.read_parquet(res_dir))
            print(f"rows-only {res_dir.name}: {n} rows {'ok' if n > 0 else 'EMPTY!'}")
            if n == 0:
                failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

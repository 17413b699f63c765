#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_local.py <verify_out_dir> [sf_dir]

Reads each <out_dir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
sf parquet tables, sorts columns by name, and compares row-wise values.
"""
import json
import sys

import duckdb
import pandas as pd
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        try:
            mine = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows (rows-only check)")
            continue
        try:
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(oracle)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs oracle {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: {len(a)} rows vs oracle {len(b)}")
            n_fail += 1
            continue
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            bad = diff.any(axis=1)
            print(f"FAIL  {name}: {int(bad.sum())}/{len(a)} rows differ; first diffs:")
            print(pd.concat([a[bad].head(3).add_suffix("_spark"),
                             b[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(a)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

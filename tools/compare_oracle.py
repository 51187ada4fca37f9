#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script loads each
query's parquet, runs its oracle SQL in DuckDB over the same testdata tables,
and compares (rows, schema-ish, values) after sorting rows and columns.

Usage: tools/compare_oracle.py <sfDir> <outDir>
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not glob.glob(f"{qdir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.read_parquet(qdir))
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                ga, ea = g.astype(float).to_numpy(), e.astype(float).to_numpy()
                eq = (ga == ea) | (np.isnan(ga) & np.isnan(ea))
                # exact double equality required (both sides round identically)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c}[{i}]: {ga[i]!r} != {ea[i]!r} (maxdiff={np.nanmax(np.abs(ga-ea))})")
            else:
                eq = (g.isna() & e.isna()) | (g == e)
                if not eq.fillna(False).all():
                    i = int(np.argmin(eq.fillna(False).to_numpy()))
                    bad.append(f"{c}[{i}]: {g.iloc[i]!r} != {e.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: {len(bad)} col mismatches: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))

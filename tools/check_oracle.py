#!/usr/bin/env python3
"""Dev harness mimicking the driver's t2 correctness gate:
run `sbt runMain graft.Verify <sfDir> <outDir>` first, then this script
loads each query's parquet output, runs the corresponding oracle SQL in
DuckDB over the same sfDir tables, canonicalizes both (columns sorted by
name, rows sorted, doubles rounded to 6dp) and compares.

Usage: python tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(int)
        else:
            try:
                df[c] = df[c].astype(np.int64)
            except Exception:
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        import time
        t0 = time.time()
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        dt = time.time() - t0
        cg, ce = canon(got.copy()), canon(exp.copy())
        if list(cg.columns) != list(ce.columns):
            results[name] = f"COL_MISMATCH got={list(cg.columns)} exp={list(ce.columns)} ({dt:.1f}s)"
        elif len(cg) != len(ce):
            results[name] = f"ROWCOUNT_MISMATCH got={len(cg)} exp={len(ce)} ({dt:.1f}s)"
        elif not cg.equals(ce):
            neq = (cg != ce).any(axis=1)
            idx = neq[neq].index[:3]
            results[name] = (f"VALUE_MISMATCH ({dt:.1f}s) sample got:\n{cg.loc[idx]}\nexp:\n{ce.loc[idx]}")
        else:
            results[name] = f"OK rows={len(cg)} oracle={dt:.1f}s"
    width = max(len(k) for k in results)
    nfail = 0
    for k in sorted(results):
        ok = results[k].startswith("OK") or results[k].startswith("ROWS_ONLY")
        nfail += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {results[k]}")
    print(f"\n{len(results) - nfail}/{len(results)} pass")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()

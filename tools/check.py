#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (rows, schema kinds,
values) with the Spark result parquet that graft.Verify dumped.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
        fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    d = d.sort_values(list(d.columns)).reset_index(drop=True)
    mismatch = []
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            mismatch.append(f"dtype[{c}]: {sv.dtype} vs {dv.dtype}")
        try:
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch.append(f"val[{c}] row{i}: {sv[i]!r} vs {dv[i]!r} ({int(neq.sum())} diffs)")
        except Exception as e:
            mismatch.append(f"cmp[{c}]: {e}")
    if mismatch:
        print(f"FAIL {name}: " + "; ".join(mismatch[:3])); fail += 1
    else:
        print(f"ok   {name} ({len(s)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

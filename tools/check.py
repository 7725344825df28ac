#!/usr/bin/env python3
"""Dev-only local emulation of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the corresponding Spark result parquet from
<outDir>/<name>/, and compares: columns sorted by name, rows sorted, exact
value equality. NOT part of the shipped engine (driver-side python tooling).

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import json, sys, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: schema {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
    gs = got.sort_values(by=list(got.columns), kind="mergesort").reset_index(drop=True)
    es = exp.sort_values(by=list(exp.columns), kind="mergesort").reset_index(drop=True)
    # normalize dtypes for comparison (e.g. int32 vs int64 pandas quirks)
    same = True
    for c in gs.columns:
        a, b = gs[c], es[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            print(f"FAIL {name}: col {c} row {i}: {a[i]!r} vs {b[i]!r} "
                  f"(dtypes {a.dtype}/{b.dtype})")
            same = False; fail += 1
            break
    if same:
        print(f"ok   {name} ({len(got)} rows)")
print("ALL OK" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)

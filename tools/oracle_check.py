#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after
`runMain graft.Verify <sfDir> <outDir>` and compare each dumped parquet against
DuckDB executing the corresponding oracle SQL over the same sf tables.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
errors = json.load(open(f"{out}/_errors.json")) if os.path.exists(f"{out}/_errors.json") else {}

def canon(df):
    df = df[sorted(df.columns)]
    # normalize float noise like the driver: round floats to 9 sig digits
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    rows = sorted(map(tuple, df.astype(str).values.tolist()))
    return rows

fails = []
for name, sql in sorted(oracle.items()):
    pq = f"{out}/{name}"
    if name in errors:
        fails.append((name, "spark-error: " + errors[name][:120])); continue
    if not os.path.isdir(pq):
        fails.append((name, "missing parquet")); continue
    try:
        s = con.execute(
            f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
        o = con.execute(sql).df()
    except Exception as e:
        fails.append((name, "exec: " + str(e)[:150])); continue
    if sorted(s.columns) != sorted(o.columns):
        fails.append((name, f"schema {sorted(s.columns)} vs {sorted(o.columns)}")); continue
    if len(s) != len(o):
        fails.append((name, f"rows {len(s)} vs {len(o)}")); continue
    if canon(s) != canon(o):
        fails.append((name, "hash"))
print(f"checked={len(oracle)} failed={len(fails)}")
for n, why in fails:
    print("FAIL", n, why)
sys.exit(1 if fails else 0)

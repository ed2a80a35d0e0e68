#!/usr/bin/env python3
"""Local stand-in for the driver's correctness compare.

Usage: tools/localverify.py <sfDir> <outDir> [name1,name2,...]
Expects `sbt "runMain graft.Verify <sfDir> <outDir> [names]"` to have been run first.
Mimics the driver: loads each <outDir>/<name> parquet, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the raw parquet tables, sorts columns by name,
hash-compares values.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            continue
        schema_ok = sorted(s_cols) == sorted(o_cols)
        rows_ok = len(s_rows) == len(o_rows)
        hash_ok = schema_ok and rowset(s_cols, s_rows) == rowset(o_cols, o_rows)
        tag = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        print(f"{name}: {tag} rows={len(s_rows)}/{len(o_rows)} "
              f"schema={schema_ok} hash={hash_ok}")
        if tag == "FAIL" and schema_ok:
            a, b = rowset(s_cols, s_rows), rowset(o_cols, o_rows)
            sa, sb = set(a), set(b)
            for d in list(sa - sb)[:3]:
                print(f"  spark-only: {d}")
            for d in list(sb - sa)[:3]:
                print(f"  oracle-only: {d}")

if __name__ == "__main__":
    main()

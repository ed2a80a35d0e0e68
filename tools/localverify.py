#!/usr/bin/env python3
"""Local stand-in for the driver's correctness compare.

Usage: tools/localverify.py <sfDir> <outDir> [name1,name2,...]
Expects `sbt "runMain graft.Verify <sfDir> <outDir> [names]"` to have been run first.
Mimics the driver: loads each <outDir>/<name> parquet, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the raw parquet tables, sorts columns by name,
hash-compares values.

Round-11 parity fix: the r10 driver failed two entries (p_bpe_train,
p_shard_manifest) that this script passed, because the oracle's uncast integer
SUM is HUGEINT in DuckDB while the Spark side writes BIGINT — stringified
values match but typed values don't. We now ALSO compare arrow-level type
families per column (ints together, hugeint/decimal/float distinct), so an
oracle whose result type wouldn't round-trip through the driver's typed hasher
fails locally too. Keep every oracle projection cast to an exact storable type
(BIGINT/DOUBLE/VARCHAR) — `type=False` here predicts a driver hash-red.
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

def type_family(arrow_type):
    """Coarse type family: differences inside a family round-trip through the
    driver's hasher; differences across families do not."""
    t = str(arrow_type)
    if t in ("int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64"):
        return "int"
    if t in ("float", "float32", "double", "float64", "halffloat"):
        return "float"
    if t.startswith("decimal128") or t.startswith("decimal256"):
        # hugeint arrives as decimal128(38,0); flag it apart from real decimals
        return "hugeint" if t.endswith(", 0)") or t.endswith(",0)") else "decimal"
    if t in ("string", "large_string", "utf8", "large_utf8"):
        return "str"
    if t == "bool":
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("date"):
        return "date"
    if t.startswith("list") or t.startswith("large_list"):
        return "list"
    return t

def typed_schema(tbl):
    sch = tbl.schema
    return {sch.field(i).name: type_family(sch.field(i).type)
            for i in range(len(sch))}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_arrow = spark.fetch_arrow_table()
            s_cols = s_arrow.schema.names
            s_rows = [tuple(col[i].as_py() for col in s_arrow.columns)
                      for i in range(s_arrow.num_rows)]
            o = con.execute(sql)
            o_arrow = o.fetch_arrow_table()
            o_cols = o_arrow.schema.names
            o_rows = [tuple(col[i].as_py() for col in o_arrow.columns)
                      for i in range(o_arrow.num_rows)]
        except Exception as e:
            print(f"{name}: ERROR {e}")
            n_fail += 1
            continue
        schema_ok = sorted(s_cols) == sorted(o_cols)
        rows_ok = len(s_rows) == len(o_rows)
        hash_ok = schema_ok and rowset(s_cols, s_rows) == rowset(o_cols, o_rows)
        s_types, o_types = typed_schema(s_arrow), typed_schema(o_arrow)
        type_bad = [c for c in s_types
                    if schema_ok and s_types.get(c) != o_types.get(c)]
        type_ok = schema_ok and not type_bad
        tag = "OK" if (schema_ok and rows_ok and hash_ok and type_ok) else "FAIL"
        if tag == "FAIL":
            n_fail += 1
        print(f"{name}: {tag} rows={len(s_rows)}/{len(o_rows)} "
              f"schema={schema_ok} hash={hash_ok} type={type_ok}")
        for c in type_bad:
            print(f"  type-mismatch {c}: spark={s_types[c]} oracle={o_types[c]}")
        if not hash_ok and schema_ok:
            a, b = rowset(s_cols, s_rows), rowset(o_cols, o_rows)
            sa, sb = set(a), set(b)
            for d in list(sa - sb)[:3]:
                print(f"  spark-only: {d}")
            for d in list(sb - sa)[:3]:
                print(f"  oracle-only: {d}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare:
runs each oracle SQL against the sf tables + compares with the Verify dump.
Usage: oracle_check.py <verify_out_dir> <sf_dir>"""
import sys, os, json
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark = con.execute(
        f"select * from read_parquet('{d}/*.parquet')").df()
    if name not in oracle:
        print(f"{name:28s} rows={len(spark):7d} NO_ORACLE")
        continue
    try:
        ora = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE_SQL_ERROR {e}")
        fails.append(name)
        continue
    cols_s = sorted(spark.columns)
    cols_o = sorted(ora.columns)
    schema_ok = cols_s == cols_o
    rows_ok = len(spark) == len(ora)
    hash_ok = False
    if schema_ok and rows_ok:
        a = spark[cols_s].sort_values(cols_s).reset_index(drop=True)
        b = ora[cols_o].sort_values(cols_o).reset_index(drop=True)
        a = a.astype(str)
        b = b.astype(str)
        hash_ok = a.equals(b)
        if not hash_ok:
            diff = (a != b).any(axis=1)
            print("  spark:", a[diff].head(3).to_dict("records"))
            print("  oracle:", b[diff].head(3).to_dict("records"))
    ok = schema_ok and rows_ok and hash_ok
    if not ok:
        fails.append(name)
    print(f"{name:28s} rows={len(spark):7d}/{len(ora):7d} "
          f"schema={schema_ok} hash={hash_ok} {'OK' if ok else 'FAIL'}")
    if not schema_ok:
        print(f"  spark cols: {cols_s}\n  oracle cols: {cols_o}")
print(f"\n{len(fails)} failures: {fails}" if fails else "\nall green")
sys.exit(1 if fails else 0)

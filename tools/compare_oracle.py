#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: for each query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and compare (column-name-sorted, row-sorted) values."""
import json, sys, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    res = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v): v = "NaN"
            rr.append(v)
        res.append(tuple(rr))
    return sorted(res, key=repr), [cols[i] for i in order]

ok = fail = 0
for name, sql in sorted(oracles.items()):
    try:
        spark = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        srows, scols = norm(spark.fetchall(), [c for c in spark.columns])
        duck = con.sql(sql)
        drows, dcols = norm(duck.fetchall(), [c for c in duck.columns])
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            fail += 1
        elif srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b]
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows; first diffs:")
            for a, b in diff[:3]:
                print(f"   spark={a}\n   duck ={b}")
            if len(srows) != len(drows):
                print(f"   spark only: {[r for r in srows if r not in drows][:2]}")
                print(f"   duck only:  {[r for r in drows if r not in srows][:2]}")
            fail += 1
        else:
            print(f"ok   {name} ({len(srows)} rows)")
            ok += 1
    except Exception as e:
        print(f"ERR  {name}: {str(e)[:300]}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

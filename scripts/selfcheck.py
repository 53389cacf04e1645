#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
against DuckDB oracles and diff. Usage: selfcheck.py [verify_out_dir] [sf_dir]
(assumes Verify has already written parquet results + oracle_sql.json)."""
import sys, json, glob, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        skips.append(name)
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    # driver compare: sort columns by name, then sort rows, then compare values
    sc = spark_df[sorted(spark_df.columns)]
    oc = ora_df[sorted(ora_df.columns)]
    if list(sc.columns) != list(oc.columns):
        fails.append((name, f"columns differ: {list(sc.columns)} vs {list(oc.columns)}"))
        continue
    sc = sc.sort_values(by=list(sc.columns)).reset_index(drop=True)
    oc = oc.sort_values(by=list(oc.columns)).reset_index(drop=True)
    if len(sc) != len(oc):
        fails.append((name, f"row count {len(sc)} vs {len(oc)}"))
        continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(sc, oc, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        fails.append((name, str(e)[:500]))

print(f"PASS {len(passes)}: {passes}")
print(f"SKIP (rows-only) {len(skips)}: {skips}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"  == {n}: {msg}")
sys.exit(1 if fails else 0)

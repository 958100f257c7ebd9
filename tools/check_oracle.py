#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Reads each SparkEntry query result (parquet written by graft.Verify),
runs the corresponding oracle SQL in DuckDB over views named after the
fixture tables, sorts columns by name, and compares schema + values.
Dev-only tool — the shipped Scala library does not depend on it.
"""
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
declared = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
print(f"{len(declared)} query results, {len(oracle)} oracles")

fails = []
for name in declared:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no parquet output")); continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    if name not in oracle:
        print(f"  {name}: NO-ORACLE rows={len(spark)}")
        continue
    try:
        duck = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    s = spark[sorted(spark.columns)]
    d = duck[sorted(duck.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((name, f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        fails.append((name, f"row count differs: spark={len(s)} duck={len(d)}"))
        continue
    if list(map(str, s.dtypes)) != list(map(str, d.dtypes)):
        print(f"  {name}: dtype note spark={list(map(str, s.dtypes))} duck={list(map(str, d.dtypes))}")
    sv = s.astype(str).values.tolist()
    dv = d.astype(str).values.tolist()
    if sv != dv:
        bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
        fails.append((name, f"values differ at row {bad}: spark={sv[bad]} duck={dv[bad]}"))
        continue
    print(f"  {name}: OK rows={len(s)}")

if fails:
    print(f"\nFAILED {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("\nall declared oracles match")

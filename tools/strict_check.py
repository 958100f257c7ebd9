#!/usr/bin/env python3
"""Strict dev harness approximating the driver's hash compare.

Differences from check_oracle.py: values are compared with full-precision
repr (floats via repr -> shortest exact form), row order is NOT re-sorted
(the driver hashes in result order), and the first mismatching cell is
reported with both raw reprs and dtypes.

Usage: python3 tools/strict_check.py [sfDir] [verifyOutDir] [only_query...]
"""
import duckdb, glob, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in sorted(glob.glob(f"{sf}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
declared = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))


def cell(v):
    # full-precision canonical string for a cell
    import math
    import numpy as np
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


fails = []
for name in declared:
    if only and name not in only:
        continue
    if name not in oracle:
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no parquet output"))
        continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    try:
        ddf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    s = sdf[sorted(sdf.columns)]
    d = ddf[sorted(ddf.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((name, f"columns: spark={list(s.columns)} duck={list(d.columns)}"))
        continue
    if len(s) != len(d):
        fails.append((name, f"rows: spark={len(s)} duck={len(d)}"))
        continue
    sv = [[cell(v) for v in row] for row in s.itertuples(index=False)]
    dv = [[cell(v) for v in row] for row in d.itertuples(index=False)]
    if sv != dv:
        bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
        col = next(j for j, (a, b) in enumerate(zip(sv[bad], dv[bad])) if a != b)
        fails.append((name,
            f"row {bad} col '{s.columns[col]}' "
            f"(spark dtype={s.dtypes.iloc[col]}, duck dtype={d.dtypes.iloc[col]}): "
            f"spark={sv[bad][col]!r} duck={dv[bad][col]!r}"))
        continue
    print(f"  {name}: OK rows={len(s)}")

if fails:
    print(f"\nSTRICT-FAILED {len(fails)}:")
    for n, why in fails:
        print(f"  {n}: {why}")
    sys.exit(1)
print("\nall strict checks pass")

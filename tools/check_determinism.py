#!/usr/bin/env python3
"""Run-to-run determinism check: compare two graft.Verify dumps as
per-query multisets. Catches nondeterminism the DuckDB oracle can miss
(tied sorts resolved differently run to run, arbitrary-pick aggregates)
— the oracle only sees ONE run's dump.

Usage: python3 tools/check_determinism.py <outdir1> <outdir2>
"""
import os, sys, glob
import duckdb

d1, d2 = sys.argv[1], sys.argv[2]
names = sorted(os.path.basename(p) for p in glob.glob(f"{d1}/q*"))
names2 = sorted(os.path.basename(p) for p in glob.glob(f"{d2}/q*"))
if names != names2:
    print(f"FAIL: query sets differ: {set(names) ^ set(names2)}")
    sys.exit(1)

con = duckdb.connect()
fails = 0
for name in names:
    s1 = f"'{d1}/{name}/*.parquet'"
    s2 = f"'{d2}/{name}/*.parquet'"
    try:
        # symmetric multiset difference must be empty
        (n,) = con.execute(
            f"SELECT count(*) FROM ((SELECT * FROM {s1} EXCEPT ALL "
            f"SELECT * FROM {s2}) UNION ALL (SELECT * FROM {s2} "
            f"EXCEPT ALL SELECT * FROM {s1}))").fetchone()
        (rows,) = con.execute(f"SELECT count(*) FROM {s1}").fetchone()
        if n == 0:
            print(f"ok   {name} ({rows} rows)", flush=True)
        else:
            fails += 1
            print(f"FAIL {name}: {n} rows differ between runs", flush=True)
    except Exception as e:
        fails += 1
        print(f"FAIL {name}: {e}", flush=True)
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
sf parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name, and compares values exactly.

Usage: python3 tools/check_oracle.py <sfdir> <outdir>
"""
import json, math, os, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # ScaleUp-generated corpora are parquet DIRECTORIES (Spark layout)
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    if t == "events":
        # generated events store raw BIGINT nanos; the real testdata is
        # TIMESTAMP(NANOS)/MICROS which DuckDB reads natively. Normalize
        # to TIMESTAMP so every oracle sees one schema (graft.Tables
        # does the same on the Spark side).
        (ts_type,) = [r[1] for r in con.execute(
            f"DESCRIBE SELECT ts FROM {src}").fetchall()]
        if ts_type == "BIGINT":
            con.execute(
                f"CREATE VIEW {t} AS SELECT event_id, "
                f"make_timestamp(ts // 1000) AS ts, user_id, event_type, "
                f"value, props FROM {src}")
            continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet({files!r})").df()
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1
        continue
    dtype_diffs = [
        (c, str(got[c].dtype), str(want[c].dtype))
        for c in want.columns if str(got[c].dtype) != str(want[c].dtype)
    ]
    if dtype_diffs:
        print(f"FAIL {name}: dtype mismatch {dtype_diffs}")
        fails += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fails += 1
        continue
    bad = None
    for c in want.columns:
        wv, gv = want[c].tolist(), got[c].tolist()
        for i, (w, g) in enumerate(zip(wv, gv)):
            eq = (w == g) or (w is None and g is None)
            if not eq and isinstance(w, float) and isinstance(g, float):
                eq = (math.isnan(w) and math.isnan(g)) or w == g
            if not eq:
                bad = (c, i, w, g)
                break
        if bad:
            break
    if bad:
        c, i, w, g = bad
        print(f"FAIL {name}: col {c} row {i}: spark={g!r} oracle={w!r}")
        fails += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

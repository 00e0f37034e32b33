#!/usr/bin/env python3
"""check_oracle.py variant with a FRESH DuckDB connection per query.

The shared-connection form dies in a cascade at generated sf0.3: one
resource-heavy replay (q163's brute-force nprobe tuner) exhausts the
process allocator and every later query on the same connection reports
a spurious Out of Memory. Per-query connections (with an explicit
memory_limit + on-disk temp spill) isolate the blast radius so a
resource failure stays one query's failure.

Per-connection isolation is NOT enough: duckdb's allocator is
process-global, so one exhausted replay poisons every later connection
in the same interpreter. Run with no query argument and the script
re-invokes ITSELF in a subprocess per query; pass a query name to run
just that one in-process.

Usage: python3 tools/check_oracle_isolated.py <sfdir> <outdir> [mem_limit] [query]
"""
import json, math, os, subprocess, sys, glob

sfdir, outdir = sys.argv[1], sys.argv[2]
mem = sys.argv[3] if len(sys.argv) > 3 else "24GB"
only = sys.argv[4] if len(sys.argv) > 4 else None

if only is None:
    names = sorted(json.load(open(f"{outdir}/oracle_sql.json")))
    fails = 0
    for name in names:
        r = subprocess.run(
            [sys.executable, __file__, sfdir, outdir, mem, name],
            capture_output=True, text=True)
        lines = [l for l in (r.stdout or "").splitlines()
                 if l.startswith(("ok", "FAIL"))]
        out = lines[0] if lines else (
            f"FAIL {name}: subprocess died: "
            f"{(r.stderr or '').strip().splitlines()[-1:] or ['no output']}")
        print(out, flush=True)
        if not out.startswith("ok"):
            fails += 1
        subprocess.run(["rm", "-rf", "/tmp/duckdb_spill"])
    print("ALL OK" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)

import duckdb
# Pre-import the pandas/numpy stack BEFORE any replay runs: the
# list-heavy replays (q210's Hamming-ball lambdas) drive duckdb's
# allocator to ~64k mmaps of the kernel's 65,530 per-process
# vm.max_map_count ceiling, and a lazy numpy import at .df() time then
# fails mid-load ("failed to map segment" / OpenBLAS pthread_create
# EAGAIN / a spurious duckdb 16KB "Out of Memory"). Mapping the .so
# files up front takes them out of the contended window.
import pandas  # noqa: F401

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fresh_con():
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    # threads=8, NOT the 32-core default: allocator map-count pressure
    # is what actually kills the heavy replays, and it is not linear in
    # data size — measured on q210 at sf0.3: 32 threads peak 63,810
    # maps, 16 threads 64,576, 8 threads 40,411 (ceiling 65,530).
    # 8 leaves real margin; the wall-time cost on the heavy replays is
    # small (they are allocator-bound, not CPU-bound).
    con.execute("SET threads=8")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        if t == "events":
            (ts_type,) = [r[1] for r in con.execute(
                f"DESCRIBE SELECT ts FROM {src}").fetchall()]
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT event_id, "
                    f"make_timestamp(ts // 1000) AS ts, user_id, event_type, "
                    f"value, props FROM {src}")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if name != only:
        continue
    try:
        con = fresh_con()
        want = con.execute(sql).df()
        con.close()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}", flush=True)
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output", flush=True)
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
        print(f"FAIL {name}: col {c} row {i}: spark={g!r} oracle={w!r}", flush=True)
        fails += 1
    else:
        print(f"ok   {name} ({len(got)} rows)", flush=True)
if only is None:
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

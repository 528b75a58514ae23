#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same sf dir, compares row-by-row with columns sorted by
name. Usage: check.py <outDir> <sfDir> [query...]

Every oracle runs under a PER-QUERY TIME BUDGET (GRAFT_ORACLE_BUDGET
seconds, default 120): one oracle whose DuckDB restatement blows up
(round 15: cu_stream_pipeline's re-inlined CTE chain, ~45 min
single-core) must fail LOUDLY as `oracle_slow`, not wedge the whole
gate past its wall-clock and cost the round its correctness artifact.
Slow-but-passing oracles (> GRAFT_ORACLE_WARN, default 10 s) print
their time so they're visible before they grow into budget busters."""
import json, sys, math, time, threading
import duckdb
import pyarrow.parquet as pq
import glob, os

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
BUDGET = float(os.environ.get("GRAFT_ORACLE_BUDGET", "120"))
WARN = float(os.environ.get("GRAFT_ORACLE_WARN", "10"))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        tbl = pq.read_table(pdir)
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fails.append(name); continue
    timer = threading.Timer(BUDGET, con.interrupt)
    timer.start()
    t0 = time.time()
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        dt = time.time() - t0
        if dt >= BUDGET - 1:
            print(f"FAIL {name}: oracle_slow (interrupted after {dt:.0f}s, "
                  f"budget {BUDGET:.0f}s)")
        else:
            print(f"FAIL {name}: oracle error {e}")
        fails.append(name); continue
    finally:
        timer.cancel()
    dt = time.time() - t0
    if dt > WARN:
        print(f"slow {name}: oracle took {dt:.1f}s (budget {BUDGET:.0f}s)")
    # sort columns by name (driver semantics)
    got_cols = sorted(tbl.column_names)
    want_cols = sorted(want.column_names)
    if got_cols != want_cols:
        print(f"FAIL {name}: schema {got_cols} vs {want_cols}")
        fails.append(name); continue
    g = [[norm(v) for v in row] for row in zip(*[tbl.column(c).to_pylist() for c in got_cols])]
    w = [[norm(v) for v in row] for row in zip(*[want.column(c).to_pylist() for c in want_cols])]
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fails.append(name); continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first @{i}:")
        print(f"  spark : {a}")
        print(f"  duckdb: {b}")
        fails.append(name)
    else:
        print(f"ok   {name} ({len(g)} rows)")

missing = [q for q in json.load(open(f"{out_dir}/oracle_sql.json"))] if False else []
print(f"\n{len(fails)} failures" if fails else "\nALL GREEN")
sys.exit(1 if fails else 0)

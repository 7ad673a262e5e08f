#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev-only tooling —
the shipped library never depends on this). Runs after `sbt "runMain
graft.Verify <sfDir> <outDir>"`: loads each <outDir>/<name> parquet,
runs the matching oracle SQL in DuckDB over the raw test tables, and
compares after sorting columns by name — exact for non-floats,
bitwise-with-report for floats so hash-style comparison issues
surface here first.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    if not os.path.isdir(os.path.join(out_dir, name)):
        fails.append((name, "query produced no output (failed in Verify?)"))
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        fails.append((name, "no parquet written")); continue
    got = pd.read_parquet(path)
    if name not in oracle:
        skips.append((name, len(got)))
        if len(got) == 0:
            fails.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"row count {len(got)} vs {len(exp)}")); continue
    ok = True
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == 'f' or e.dtype.kind == 'f':
            g = g.astype('float64'); e = e.astype('float64')
            same = (g == e) | (np.isnan(g) & np.isnan(e))
            if not same.all():
                i = int(np.argmin(same))
                fails.append((name, f"float col {c} differs at row {i}: {g[i]!r} vs {e[i]!r} (maxdiff {np.nanmax(np.abs(g-e))})"))
                ok = False; break
        else:
            gs, es = g.astype(str), e.astype(str)
            if not (gs == es).all():
                i = int(np.argmin(gs == es))
                fails.append((name, f"col {c} differs at row {i}: {g[i]!r} vs {e[i]!r}"))
                ok = False; break
    if ok:
        passes.append((name, len(got)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, r in skips: print(f"ROWS-ONLY {n} ({r} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark results
written by graft.Verify (sorted columns, sorted rows, exact values)."""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "spark result missing")); continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"query error: {e}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"columns differ: spark={gc} oracle={ec}")); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(e):
        fails.append((name, f"row count: spark={len(g)} oracle={len(e)}")); continue
    if len(g) == 0:
        skips.append((name, "0 rows both sides")); continue
    neq = (g.astype(str) != e.astype(str))
    if neq.any().any():
        bad_cols = [c for c in gc if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        fails.append((name, f"values differ in {bad_cols}; first row {i}: "
                            f"spark={g.iloc[i].to_dict()} oracle={e.iloc[i].to_dict()}"))
    else:
        passes.append((name, f"{len(g)} rows"))

for n, m in passes: print(f"PASS {n} ({m})")
for n, m in skips: print(f"WARN {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(skips)} warn, {len(fails)} fail")
sys.exit(1 if fails else 0)

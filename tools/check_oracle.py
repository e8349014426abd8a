#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark results
written by graft.Verify (sorted columns, sorted rows, exact values).

--json <path> additionally writes the driver-schema per-query record
({name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}}) so every closing Verify can commit its own CORRECTNESS_builder.json
— the round's hard signal no longer depends on a single harness artifact
(r14's driver file arrived empty and the round was nearly ungradeable).
"""
import json, sys, glob, os
import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
json_out = None
for i, a in enumerate(sys.argv[1:], start=1):
    if a == "--json":
        json_out = sys.argv[i + 1]
    elif a.startswith("--json="):
        json_out = a.split("=", 1)[1]
if json_out in set(args):
    args.remove(json_out)
sfdir, outdir = args[0], args[1]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
record = {}


def rec(name, rows_match, schema_match, hash_match, sr, orr, err):
    record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                    "hash_match": hash_match, "spark_rows": sr,
                    "oracle_rows": orr, "err": err}


for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "spark result missing"))
        rec(name, False, False, False, 0, 0, "spark result missing")
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"query error: {e}"))
        rec(name, False, False, False, 0, 0, f"query error: {e}")
        continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"columns differ: spark={gc} oracle={ec}"))
        rec(name, len(got) == len(exp), False, False, len(got), len(exp),
            f"columns differ: spark={gc} oracle={ec}")
        continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(e):
        fails.append((name, f"row count: spark={len(g)} oracle={len(e)}"))
        rec(name, False, True, False, len(g), len(e),
            f"row count: spark={len(g)} oracle={len(e)}")
        continue
    if len(g) == 0:
        skips.append((name, "0 rows both sides"))
        rec(name, True, True, True, 0, 0, "0 rows both sides")
        continue
    neq = (g.astype(str) != e.astype(str))
    if neq.any().any():
        bad_cols = [c for c in gc if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        fails.append((name, f"values differ in {bad_cols}; first row {i}: "
                            f"spark={g.iloc[i].to_dict()} oracle={e.iloc[i].to_dict()}"))
        rec(name, True, True, False, len(g), len(e),
            f"values differ in {bad_cols}")
    else:
        passes.append((name, f"{len(g)} rows"))
        rec(name, True, True, True, len(g), len(e), None)

for n, m in passes: print(f"PASS {n} ({m})")
for n, m in skips: print(f"WARN {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(skips)} warn, {len(fails)} fail")
if json_out:
    json.dump(record, open(json_out, "w"), indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(record)} queries)")
sys.exit(1 if fails else 0)

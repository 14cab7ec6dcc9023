#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir parquet tables and compare against the parquet the
Verify main dumped. Strict: columns sorted by name, row order preserved,
exact value equality (floats compared bitwise via repr) — if this passes,
any reasonable driver compare passes."""
import json, sys, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []

def canon(v):
    if isinstance(v, float):
        return repr(v)
    return v

for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "spark output missing"))
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{spark_dir}/*.parquet'").fetchall()
    except Exception as e:
        fails.append((name, f"spark read error: {e}"))
        continue
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        # re-project in sorted column order, preserving row order
        exp_rows = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM ({sql})").fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if got_cols != exp_cols:
        fails.append((name, f"columns differ: spark={got_cols} oracle={exp_cols}"))
        continue
    if len(got_rows) != len(exp_rows):
        fails.append((name, f"row count differs: spark={len(got_rows)} oracle={len(exp_rows)}"))
        continue
    bad = None
    for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
        if tuple(map(canon, g)) != tuple(map(canon, e)):
            bad = (i, g, e)
            break
    if bad:
        fails.append((name, f"row {bad[0]} differs:\n  spark : {bad[1]}\n  oracle: {bad[2]}\n  cols: {got_cols}"))
    else:
        passes.append((name, len(got_rows)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)

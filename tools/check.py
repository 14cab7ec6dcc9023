#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sfDir parquet tables and compare against the parquet the
Verify main dumped.

Comparison is aligned with the driver's: both sides are materialized to
pandas (DuckDB .df() — the same materialization path the driver uses, so
e.g. HUGEINT arriving as float64 is VISIBLE here, not normalized away),
columns sorted by name, row order preserved, and cells compared with
dtype-sensitive equality (numpy float64 30139.0 != int64 30139). If this
passes, the driver's value hash passes; round 2 proved the reverse is not
true for fetchall()-based comparison (Python ints hid a float64 dtype)."""
import json, sys, glob, os
import duckdb
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []

def canon(v):
    """Dtype-sensitive canonical form: a float64 integer value does NOT
    equal an int64 of the same value (this is exactly what the driver's
    no-coercion hash sees)."""
    if isinstance(v, (np.floating, float)):
        return ("f", repr(float(v)))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, np.ndarray):
        return ("a", tuple(canon(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    return v

def frame_cells(df):
    return [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]

for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        fails.append((name, "spark output missing"))
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        got_cols = sorted(got.columns)
        got_df = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark read error: {e}"))
        continue
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        # re-project in sorted column order, preserving row order
        exp_df = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM ({sql})").df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    if got_cols != exp_cols:
        fails.append((name, f"columns differ: spark={got_cols} oracle={exp_cols}"))
        continue
    if len(got_df) != len(exp_df):
        fails.append((name, f"row count differs: spark={len(got_df)} oracle={len(exp_df)}"))
        continue
    # The driver's hash is value-based: it distinguishes float64 from
    # int64 (30139.0 vs 30139 — the round-2 q_a7 failure) but NOT int
    # widths (q_o3/q_p3 passed r2 with DuckDB int32 vs Spark int64).
    # Compare dtype KIND (i/u/f/b/M/O), not width.
    got_kinds = [d.kind for d in got_df.dtypes]
    exp_kinds = [d.kind for d in exp_df.dtypes]
    norm = lambda k: "i" if k == "u" else k
    if list(map(norm, got_kinds)) != list(map(norm, exp_kinds)):
        fails.append((name, f"dtype kinds differ (driver hash would mismatch):\n"
                            f"  spark : {dict(zip(got_cols, map(str, got_df.dtypes)))}\n"
                            f"  oracle: {dict(zip(exp_cols, map(str, exp_df.dtypes)))}"))
        continue
    bad = None
    for i, (g, e) in enumerate(zip(frame_cells(got_df), frame_cells(exp_df))):
        if g != e:
            bad = (i, g, e)
            break
    if bad:
        fails.append((name, f"row {bad[0]} differs:\n  spark : {bad[1]}\n  oracle: {bad[2]}\n  cols: {got_cols}"))
    else:
        passes.append((name, len(got_df)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)

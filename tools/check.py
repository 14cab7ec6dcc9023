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
true for fetchall()-based comparison (Python ints hid a float64 dtype).

Process model: each query runs in its OWN forked child. Big-SF oracle
replays (token-level span rebuilds, two-chunk simhash banding at 500k
docs) exhaust the process heap when many run sequentially in one
interpreter — DuckDB instance state survives connection close while any
relation object lingers, a mid-batch OOM poisons every query after it,
and the same replays all pass in isolation. A child per query makes the
isolation structural: the OS reclaims everything at child exit, and one
query's OOM is ITS failure alone. Each child also gets an explicit
memory_limit + spill directory so out-of-core operators spill rather
than raise."""
import json, sys, glob, os
import multiprocessing as mp

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def canon(v, np):
    """Dtype-sensitive canonical form: a float64 integer value does NOT
    equal an int64 of the same value (this is exactly what the driver's
    no-coercion hash sees)."""
    if isinstance(v, (np.floating, float)):
        return ("f", repr(float(v)))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, np.ndarray):
        return ("a", tuple(canon(x, np) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x, np) for x in v))
    return v


def check_one(name, sql, spark_dir, w):
    """Runs in a forked child: one connection, one query, one verdict.
    The verdict travels over a Pipe end (`w.send`), NOT a Queue — a
    Queue.put must start a feeder THREAD, and thread creation is
    exactly what fails after a replay has pushed the process to the
    memory ceiling (observed: the span-replay comparison PASSED and the
    pass report itself crashed the child)."""
    import duckdb
    import numpy as np

    def frame_cells(df):
        return [tuple(canon(v, np) for v in row)
                for row in df.itertuples(index=False, name=None)]

    class q:  # keep the existing q.put call sites
        @staticmethod
        def put(msg):
            w.send(msg)

    try:
        con = duckdb.connect()
        # default memory_limit (80% of RAM) stays: the heaviest replay
        # (the 500k-doc token-level span rebuild) needs it and process
        # isolation already bounds the blast radius; the spill dir lets
        # the spillable operators go out-of-core below the limit
        con.sql("SET temp_directory='/tmp/graft_duckdb_spill'")
        for p in glob.glob(f"{sf_dir}/*.parquet"):
            t = os.path.basename(p)[:-len(".parquet")]
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    except Exception as e:
        q.put(("fail", f"duckdb setup error: {e}"))
        return
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        got_cols = sorted(got.columns)
        got_df = con.sql(
            f"SELECT {', '.join(got_cols)} FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        q.put(("fail", f"spark read error: {e}"))
        return
    try:
        exp = con.sql(sql)
        exp_cols = sorted(exp.columns)
        # re-project in sorted column order, preserving row order
        exp_df = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM ({sql})").df()
    except Exception as e:
        q.put(("fail", f"oracle error: {e}"))
        return
    if got_cols != exp_cols:
        q.put(("fail", f"columns differ: spark={got_cols} oracle={exp_cols}"))
        return
    if len(got_df) != len(exp_df):
        q.put(("fail",
               f"row count differs: spark={len(got_df)} oracle={len(exp_df)}"))
        return
    # The driver's hash is value-based: it distinguishes float64 from
    # int64 (30139.0 vs 30139 — the round-2 q_a7 failure) but NOT int
    # widths (q_o3/q_p3 passed r2 with DuckDB int32 vs Spark int64).
    # Compare dtype KIND (i/u/f/b/M/O), not width.
    got_kinds = [d.kind for d in got_df.dtypes]
    exp_kinds = [d.kind for d in exp_df.dtypes]
    norm = lambda k: "i" if k == "u" else k
    if list(map(norm, got_kinds)) != list(map(norm, exp_kinds)):
        q.put(("fail", "dtype kinds differ (driver hash would mismatch):\n"
                       f"  spark : {dict(zip(got_cols, map(str, got_df.dtypes)))}\n"
                       f"  oracle: {dict(zip(exp_cols, map(str, exp_df.dtypes)))}"))
        return
    for i, (g, e) in enumerate(zip(frame_cells(got_df), frame_cells(exp_df))):
        if g != e:
            q.put(("fail", f"row {i} differs:\n  spark : {g}\n  oracle: {e}\n"
                           f"  cols: {got_cols}"))
            return
    n = len(got_df)
    # release the frames and the engine before reporting: after a
    # ceiling-grazing replay even tiny allocations can fail, and the
    # verdict must get out
    del got_df, exp_df, got, exp
    con.close()
    q.put(("pass", n))


if __name__ == "__main__":
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, passes = [], []
    ctx = mp.get_context("fork")
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            fails.append((name, "spark output missing"))
            continue
        r, w = ctx.Pipe(duplex=False)
        proc = ctx.Process(target=check_one,
                           args=(name, oracle[name], spark_dir, w))
        proc.start()
        w.close()  # parent keeps only the read end
        # poll for the verdict while watching child liveness: a child
        # hard-killed by the OS (OOM killer) never posts, and a plain
        # recv() would block forever. No overall timeout — heavy big-SF
        # replays legitimately run for minutes.
        verdict = detail = None
        while verdict is None:
            if r.poll(5):
                try:
                    verdict, detail = r.recv()
                except EOFError:
                    verdict, detail = "fail", "child closed pipe without a verdict"
            elif not proc.is_alive():
                verdict = "fail"
                detail = f"child died without a verdict (exit {proc.exitcode})"
        proc.join()
        r.close()
        if verdict == "pass":
            passes.append((name, detail))
        else:
            fails.append((name, detail))

    for name, n in passes:
        print(f"PASS {name} ({n} rows)")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(passes)} passed, {len(fails)} failed")
    sys.exit(1 if fails else 0)

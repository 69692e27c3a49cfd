#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF dir, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row counts, sorted-column schemas, and value hashes.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [only_query ...]
"""
import sys, json, subprocess, hashlib, glob, os

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
args = sys.argv[3:]
skip_verify = "--skip-verify" in args
only = [a for a in args if not a.startswith("--")]

if not skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        capture_output=True, text=True, cwd="/root/repo")
    if "[success]" not in r.stdout:
        print(r.stdout[-4000:]); print(r.stderr[-2000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb, pyarrow.parquet as pq

# One FRESH connection per compared query (made in the loop below):
# DuckDB 1.0 accumulates buffer-pool state across heavy queries on one
# connection and eventually fails allocation even though each query runs
# fine alone. Spill must be enabled explicitly (temp_directory), else
# big-SF window/sort oracles die with "Failed to allocate" instead of
# spilling. Local-harness-only settings -- the driver's own gate runs at
# sf0.01 where neither triggers.
os.makedirs("/tmp/duck_spill", exist_ok=True)
def make_con():
    c = duckdb.connect()
    c.execute("SET temp_directory='/tmp/duck_spill'")
    c.execute("SET memory_limit='80GB'")
    # window-operator memory scales with threads; 8 is plenty for an
    # oracle run and keeps peak allocation well under the limit on the
    # heavy window oracles (d30/d33's per-doc windowed string_agg at
    # sf10+), which matters when the harness itself runs under a
    # memory-constrained sandbox
    c.execute("SET threads=8")
    for t in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(t)[:-len(".parquet")]
        # a table is either a single parquet file (driver layout) or a
        # directory of part files (DataGen / Spark-written layout)
        src = f"{t}/*.parquet" if os.path.isdir(t) else t
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return c

oracle = json.load(open(f"{out}/oracle_sql.json"))

# registered-vs-checked guard: every query in SparkEntry.queries must be
# BOTH oracle-covered and present in the output -- an erroring query (no
# output dir) or a missing oracle entry is a FAIL, never a silent omission.
registered, no_oracle = [], []
reg_path = f"{out}/registered.json"
if os.path.exists(reg_path):
    registered = json.load(open(reg_path))
    no_oracle = sorted(set(registered) - set(oracle))
    if no_oracle and not only:
        print(f"REGISTERED-WITHOUT-ORACLE ({len(no_oracle)}): {no_oracle}")

fails = list(no_oracle) if not only else []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        fails.append(name); print(f"{name}: MISSING spark output"); continue
    try:
        # separate fresh connections for the two sides: same rationale as
        # the per-query fresh connection (buffer-pool state accumulates on
        # a connection), applied within one query's compare so the spark
        # read's pool never inflates the heavy oracle's peak
        con = make_con()
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
        finally:
            con.close()
        con = make_con()
        try:
            ora_df = con.execute(sql).fetchdf()
        finally:
            con.close()
    except Exception as e:
        fails.append(name); print(f"{name}: ERROR {e}"); continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df
    s, o = norm(spark_df), norm(ora_df)
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    def h(df):
        # full-precision repr: a sub-1e-6 Spark/DuckDB divergence must FAIL
        # (the decimal-accumulation discipline exists to catch exactly that)
        return hashlib.md5(df.to_csv(index=False, float_format="%.17g").encode()).hexdigest()
    ok_hash = ok_rows and ok_schema and h(s) == h(o)
    status = "ok" if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        print(f"{name}: rows {len(s)}/{len(o)} schema_match={ok_schema} hash={ok_hash}")
        if not ok_schema:
            print(f"  spark cols: {list(s.columns)}\n  oracle cols: {list(o.columns)}")
        elif ok_rows and len(s) > 0:
            import pandas as pd
            merged = s.compare(o) if s.shape == o.shape else None
            if merged is not None and len(merged):
                print(merged.head(5))
    else:
        print(f"{name}: ok ({len(s)} rows)")
reg_note = f" (registered: {len(registered)})" if registered else ""
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} ok{reg_note}; fails: {fails}")
sys.exit(1 if fails else 0)

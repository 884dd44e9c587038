#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate.

Runs graft.Verify (via sbt) at a given sfDir, then replays every
oracle_sql.json entry in DuckDB with the testdata parquet registered as
tables, and compares values (columns sorted by name, rows sorted by all
columns, float-tolerant exact compare).

Usage: python3 tools/oracle_check.py [sfDir] [--skip-verify]
"""
import json, os, subprocess, sys, glob

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT = "/root/repo/target/verify_out"

def run_verify():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(r.stdout.splitlines()[-15:]) + "\n")
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            import numpy as np
            # tiny atol: double aggregates whose summation order differs
            # across engines can land a half-ulp apart right at a
            # round(x, 6) boundary; 1e-9 absorbs that without masking
            # real value differences at the 1e-6 output granularity
            ok = ((av.isna() & bv.isna()) | (np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True))).all()
        else:
            ok = av.where(av.notna(), None).astype(str).equals(bv.where(bv.notna(), None).astype(str))
        if not ok:
            diff = (av.astype(str) != bv.astype(str))
            i = diff[diff].index[:3].tolist()
            return f"VALUES col={c} rows={i} spark={av[i].tolist()} duck={bv[i].tolist()}"
    # strict dtype check (driver may compare schemas)
    for c in a.columns:
        da, db = str(a[c].dtype), str(b[c].dtype)
        if da != db:
            return f"DTYPE-WARN col={c} spark={da} duck={db}"
    return None

def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        t = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{OUT}/{name}"
        if not os.path.isdir(pdir):
            print(f"[{name}] MISSING spark output"); failures += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{pdir}/*.parquet"))])
        except ValueError:
            print(f"[{name}] EMPTY spark output dir"); failures += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"[{name}] DUCKDB ERROR: {e}"); failures += 1; continue
        err = compare(name, spark_df, duck_df)
        if err and not err.startswith("DTYPE-WARN"):
            print(f"[{name}] MISMATCH: {err}"); failures += 1
        elif err:
            print(f"[{name}] ok ({err})")
        else:
            print(f"[{name}] ok ({len(spark_df)} rows)")
    print(f"\n{'FAIL' if failures else 'PASS'}: {len(oracle) - failures}/{len(oracle)} oracles match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()

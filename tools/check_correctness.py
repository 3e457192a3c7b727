#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage:
  python3 tools/check_correctness.py [sf_dir] [out_dir] [--skip-spark]

1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless --skip-spark).
2. For every query result parquet in <out_dir>, runs the matching oracle SQL
   from <out_dir>/oracle_sql.json in DuckDB (tables = <sf_dir>/*.parquet
   registered as views by basename) and compares:
     - column-name sets,
     - row counts,
     - values, with columns sorted by name and rows sorted by all columns.
   Reports EXACT (bit-identical), CLOSE (max numeric |diff| <= 1e-9), or
   MISMATCH, so floating-point drift across engines is visible before the
   driver sees it.
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pandas as pd
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_spark():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}']
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-4000:])
    if r.returncode != 0:
        sys.exit(f"Verify failed rc={r.returncode}")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes a bit: bool -> int for stable sort, datetimes to ns
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, ora_df: pd.DataFrame):
    issues = []
    sc, oc = set(spark_df.columns), set(ora_df.columns)
    if sc != oc:
        return f"SCHEMA-MISMATCH spark-only={sorted(sc - oc)} oracle-only={sorted(oc - sc)}"
    if len(spark_df) != len(ora_df):
        return f"ROWCOUNT-MISMATCH spark={len(spark_df)} oracle={len(ora_df)}"
    s, o = normalize(spark_df), normalize(ora_df)
    exact = True
    max_diff = 0.0
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(float).to_numpy()
            bv = b.astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                exact = False
                d = np.abs(av - bv)
                d[both_nan] = 0
                md = np.nanmax(d)
                max_diff = max(max_diff, md)
                if not (md <= 1e-9):
                    bad = int((~eq).sum())
                    issues.append(f"col {c}: {bad} rows differ, max|diff|={md:.3e}")
        else:
            if a.dtype != b.dtype:
                # tolerate int32 vs int64 etc. by comparing values
                pass
            # pandas 2.2 compares None == None as False elementwise; a
            # NULL in both engines is a MATCH, so OR in the both-null mask
            both_null = (pd.isna(a) & pd.isna(b)).to_numpy()
            eq = (a.astype(object).where(pd.notna(a), None)
                  == b.astype(object).where(pd.notna(b), None)).to_numpy() | both_null
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax(~eq))
                issues.append(
                    f"col {c}: {bad} rows differ, e.g. {a.iloc[i]!r} vs {b.iloc[i]!r}")
    if issues:
        return "MISMATCH " + "; ".join(issues)
    if exact:
        return "EXACT"
    return f"CLOSE max|diff|={max_diff:.3e}"


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    results = {}
    names = [d for d in sorted(os.listdir(OUT_DIR))
             if os.path.isdir(os.path.join(OUT_DIR, d))]
    for name in names:
        try:
            spark_df = pd.read_parquet(os.path.join(OUT_DIR, name))
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:200]}"
            continue
        try:
            results[name] = compare(name, spark_df, ora_df)
        except Exception as e:
            results[name] = f"COMPARE-FAIL {str(e)[:200]}"
    missing = sorted(set(oracle) - set(names))
    width = max(len(n) for n in results) if results else 10
    n_ok = 0
    for name, res in sorted(results.items()):
        ok = res.startswith(("EXACT", "CLOSE", "NO-ORACLE"))
        n_ok += ok
        print(f"{'OK ' if ok else 'BAD'} {name:<{width}} {res}")
    for name in missing:
        print(f"BAD {name:<{width}} MISSING-SPARK-OUTPUT (query failed or absent)")
    print(f"\n{n_ok}/{len(results)} ok, {len(missing)} missing")
    sys.exit(0 if n_ok == len(results) and not missing else 1)


if __name__ == "__main__":
    main()

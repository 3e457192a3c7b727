#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(dumps each query's result + oracle_sql.json), then this script replays every
oracle in DuckDB over the same testdata and compares. Usage:

    python3 tools/local_verify.py <sfDir> <outDir> [query ...]
"""
import json, os, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_pattern(sf_dir: str, t: str) -> str:
    """Driver testdata is one file per table; Spark-written scale-up dirs
    (tools/ScaleData) are <table>.parquet/part-*.parquet — accept both."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_pattern(sf_dir, t)}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark dump")
            fails += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            ora_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            fails += 1
            continue
        s, o = norm(spark_df), norm(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA mismatch spark={list(s.columns)} oracle={list(o.columns)}")
            fails += 1
            continue
        if len(s) != len(o):
            print(f"{name}: ROWS mismatch spark={len(s)} oracle={len(o)}")
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"{name}: OK ({len(s)} rows)")
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False, rtol=1e-9)
                print(f"{name}: APPROX-ONLY (values differ at <1e-9 — would FAIL a hash compare)")
                fails += 1
            except AssertionError as e2:
                print(f"{name}: VALUE mismatch: {str(e2).splitlines()[-1] if str(e2) else e2}")
                fails += 1
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

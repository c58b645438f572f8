#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/local_verify.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables, and compares (column-name-sorted, row-sorted, exact values).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def load_spark_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps->str, decimals->float via str compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata: single file; Spark-written fixtures: a directory
        # of part files. Missing tables are skipped (partial corpora, e.g.
        # documents-only parity checks).
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
        except Exception:
            pass
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark_result(os.path.join(out_dir, name))
        if spark_df is None:
            print(f"FAIL {name}: no spark result");  n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if str(a[c].dtype) != str(b[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            # show first differing rows
            neq = (a != b) & ~(a.isna() & b.isna())
            rows = neq.any(axis=1)
            if rows.any():
                idx = rows[rows].index[:3]
                print("spark:\n", a.loc[idx]); print("duck:\n", b.loc[idx])
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

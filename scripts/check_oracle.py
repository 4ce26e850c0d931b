#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: for each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the same testdata
parquet tables and compare (columns sorted by name, exact value compare).

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Driver-side tooling only (duckdb/pandas/pyarrow are not available to the
Scala library) — this script exists so the builder can self-check before the
driver runs the real gate.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.reset_index(drop=True)

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        qdir = f"{out_dir}/{name}"
        parts = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output at {qdir}")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(p) for p in parts]))
            duck_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        if spark_df.equals(duck_df):
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(spark_df)} rows differ; first diffs:")
            for i in spark_df.index[bad][:3]:
                cols = [c for c in spark_df.columns if neq.at[i, c]]
                for c in cols[:4]:
                    print(f"   row {i} col {c}: spark={spark_df.at[i, c]!r} duck={duck_df.at[i, c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB against the raw testdata parquet and compare with the parquet that
graft.Verify wrote. Columns sorted by name, rows sorted by all columns,
values compared cell-exact (floats reported with max abs diff).

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            ora_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(ora_df.columns):
            problems.append(f"cols spark={list(spark_df.columns)} oracle={list(ora_df.columns)}")
        elif len(spark_df) != len(ora_df):
            problems.append(f"rows spark={len(spark_df)} oracle={len(ora_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], ora_df[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    aa = a.astype(float).to_numpy()
                    bb = b.astype(float).to_numpy()
                    both_nan = np.isnan(aa) & np.isnan(bb)
                    neq = ~both_nan & (aa != bb)
                    if neq.any():
                        d = np.nanmax(np.abs(aa[neq] - bb[neq]))
                        problems.append(f"col {c}: {neq.sum()} cells differ, maxdiff={d:.3e}")
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        neq = (a.astype(str) != b.astype(str))
                        i = int(np.argmax(neq.to_numpy()))
                        problems.append(
                            f"col {c}: {int(neq.sum())} cells differ, e.g. row {i}: "
                            f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r} "
                            f"(dtypes {a.dtype}/{b.dtype})")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
registers the sf parquet tables in DuckDB, runs each oracle, and
compares: column names (sorted), row counts, and value hashes over
rows sorted by all columns. Exact float equality — stricter than any
plausible driver tolerance.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, passes, rows_only = [], [], []
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            rows_only.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            fails.append((name, f"oracle error: {str(e)[:200]}"))
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            fails.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            continue
        if len(a) != len(b):
            fails.append((name, f"rowcount {len(a)} vs {len(b)}"))
            continue
        diff_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.isna() & bv.isna()) | (av == bv)
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not bool(eq.all()):
                n_bad = int((~eq).sum())
                i = int((~eq).idxmax())
                diff_cols.append(f"{c}: {n_bad} diffs, first@{i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        if diff_cols:
            fails.append((name, "; ".join(diff_cols)[:300]))
        else:
            passes.append((name, len(a)))
    for n, r in passes:
        print(f"PASS  {n} ({r} rows)")
    for n, r in rows_only:
        print(f"ROWS  {n} ({r} rows, no oracle)")
    for n, msg in fails:
        print(f"FAIL  {n}: {msg}")
    print(f"\n{len(passes)} pass, {len(rows_only)} rows-only, {len(fails)} fail")
    return 1 if fails else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))

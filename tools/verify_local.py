#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
registers the sf parquet tables in DuckDB, runs each oracle, and
compares: column names (sorted), row counts, and value hashes over
rows sorted by all columns. Exact float equality — stricter than any
plausible driver tolerance.
"""
import json, sys, glob, os, time
import duckdb

# Per-oracle DuckDB wall budget (seconds). The registry has ~300
# oracles; the driver's whole verify step must fit a fixed budget, so
# any single oracle beyond this is a defect regardless of correctness.
# Env-overridable so tools/test_verify_gate.py can trip the gate with
# a fast fixture instead of burning 10 real seconds.
SLOW_ORACLE_S = float(os.environ.get("GRAFT_SLOW_ORACLE_S", "10.0"))
# Full-sweep DuckDB wall budget (seconds) across ALL oracles. r13's
# whole sweep ran 23.6 s at sf0.01; a sweep creeping past this pin is
# the r12 blackout class (driver verify wall exhausted) even when no
# single oracle trips the per-oracle wire — HARD FAIL, not a report.
TOTAL_ORACLE_S = float(os.environ.get("GRAFT_TOTAL_ORACLE_S", "90.0"))
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def type_key(t: pa.DataType) -> str:
    """Canonical type label for driver-hash-equivalence comparison.

    The driver hashes at the pandas level, which normalizes integer
    width (int32 == int64), date vs timestamp (both -> datetime64),
    timestamp unit/tz, and string width class — r11 evidence: queries
    differing in exactly those ways all hash-pass. What pandas does
    NOT normalize is decimal (it becomes a Python-object column), so
    decimal128(38,0) vs int64 — the class behind the r11
    q_lift_curve hash-fail — stays distinct and FAILS here.
    """
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    return str(t)


def is_wide(t: pa.DataType) -> bool:
    """DuckDB-widened numeric (HUGEINT -> decimal128(38,0) etc.) that no
    Spark query legitimately emits — always a missing-cast defect."""
    return pa.types.is_decimal(t) and t.precision > 18

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
    fails, passes, rows_only, oracle_times = [], [], [], []
    # Registry-wide DESCRIBE sweep: every oracle's output types are
    # checked even when the Spark side produced no parquet (e.g. a
    # query erred and was skipped) — a widened column can never hide.
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE {oracle[name]}").df()
        except Exception:
            continue  # oracle error surfaces in the per-query loop below
        wide = [f"{r.column_name}: {r.column_type}" for r in desc.itertuples()
                if "HUGEINT" in r.column_type or "DECIMAL(38" in r.column_type]
        if wide:
            fails.append((name, "SWEEP widened oracle column(s): " + "; ".join(wide)))
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            rows_only.append((name, len(spark_df)))
            continue
        try:
            t0 = time.monotonic()
            duck_tbl = con.sql(oracle[name]).fetch_arrow_table()
            oracle_s = time.monotonic() - t0
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            fails.append((name, f"oracle error: {str(e)[:200]}"))
            continue
        # Budget tripwire: the driver's verify step has a finite wall
        # budget for the WHOLE registry. One planner-exploding oracle
        # (un-MATERIALIZED step-CTE chains — the r12 class that zeroed
        # CORRECTNESS_r12) can eat it alone, so an expensive oracle is
        # a FAIL here even when its values match.
        if oracle_s > SLOW_ORACLE_S:
            fails.append((name, f"SLOW oracle: {oracle_s:.1f}s > {SLOW_ORACLE_S}s budget"
                          " (materialize step CTEs / cut the unroll)"))
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            fails.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            continue
        # Type gate: the driver's hash is type-sensitive. Compare the
        # DuckDB arrow schema against the Spark-written parquet schema
        # column-by-column; also hard-fail any DuckDB-widened numeric.
        spark_schema = {f.name: f.type
                        for p in sorted(glob.glob(f"{d}/*.parquet"))
                        for f in pq.read_schema(p)}
        duck_schema = {f.name: f.type for f in duck_tbl.schema}
        type_diffs = []
        for c in sorted(duck_schema):
            dt = duck_schema[c]
            if is_wide(dt):
                type_diffs.append(f"{c}: oracle widened to {dt} (missing CAST ... AS BIGINT)")
            elif c in spark_schema and type_key(spark_schema[c]) != type_key(dt):
                type_diffs.append(f"{c}: spark {spark_schema[c]} vs oracle {dt}")
        if type_diffs:
            fails.append((name, "TYPE " + "; ".join(type_diffs)[:280]))
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
        oracle_times.append((oracle_s, name))
    for n, r in passes:
        print(f"PASS  {n} ({r} rows)")
    for n, r in rows_only:
        print(f"ROWS  {n} ({r} rows, no oracle)")
    for n, msg in fails:
        print(f"FAIL  {n}: {msg}")
    oracle_times.sort(reverse=True)
    sweep_wall = sum(t for t, _ in oracle_times)
    # Full-sweep budget: trips even when every individual oracle is
    # under the per-oracle wire (death by three hundred cuts).
    if sweep_wall > TOTAL_ORACLE_S:
        fails.append(("_sweep", f"SLOW sweep: oracle wall {sweep_wall:.1f}s > "
                      f"{TOTAL_ORACLE_S}s budget (r12 blackout class)"))
        print(f"FAIL  _sweep: {fails[-1][1]}")
    print(f"\noracle wall total {sweep_wall:.1f}s; slowest: "
          + ", ".join(f"{n} {t:.1f}s" for t, n in oracle_times[:5]))
    print(f"{len(passes)} pass, {len(rows_only)} rows-only, {len(fails)} fail")
    return 1 if fails else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))

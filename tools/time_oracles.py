#!/usr/bin/env python3
"""Per-oracle DuckDB wall-time profiler for the verify gate.

Runs each oracle in oracle_sql.json against the sf tables with a hard
per-query interrupt budget, printing the slowest first, so a wedged or
pathological oracle (the class that can silently eat the driver's
verify budget) is named instead of guessed at.
"""
import json, os, sys, threading, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, budget_s=90.0):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = []
    for name in sorted(oracle):
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        timer = threading.Timer(budget_s, con.interrupt)
        timer.start()
        t0 = time.monotonic()
        status = "ok"
        try:
            con.sql(oracle[name]).fetchall()
        except Exception as e:
            status = "INTERRUPTED" if "INTERRUPT" in str(e).upper() else f"ERR {str(e)[:80]}"
        dt = time.monotonic() - t0
        timer.cancel()
        con.close()
        results.append((dt, name, status))
        if dt > 5 or status != "ok":
            print(f"[slow] {dt:7.1f}s {name} {status}", flush=True)
    results.sort(reverse=True)
    print("\n=== slowest oracles ===")
    for dt, name, status in results[:40]:
        print(f"{dt:7.1f}s {name} {status}")
    print(f"total: {sum(r[0] for r in results):.1f}s over {len(results)} oracles")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out",
         float(sys.argv[3]) if len(sys.argv) > 3 else 90.0)

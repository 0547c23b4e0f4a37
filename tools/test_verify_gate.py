#!/usr/bin/env python3
"""Fixture test for the verify gate's wall-budget tripwires.

VERDICT r13 item 6: the r12 blackout class (an oracle whose DuckDB
execution eats the driver's verify wall budget) must FAIL the local
gate, not rely on builder discipline. This test plants:

  1. a well-behaved oracle            -> gate passes (rc 0)
  2. a pathological recursive-CTE oracle whose execution wall exceeds
     the per-oracle budget            -> gate fails (rc 1, SLOW oracle)
  3. a sweep whose TOTAL oracle wall exceeds the full-sweep budget
     even though each oracle is individually fast
                                       -> gate fails (rc 1, SLOW sweep)

Budgets are injected via GRAFT_SLOW_ORACLE_S / GRAFT_TOTAL_ORACLE_S so
the fixture trips in under a second instead of burning the real 10 s.
Run: python3 tools/test_verify_gate.py
"""
import json, os, subprocess, sys, tempfile

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "verify_local.py")


def write_case(out_dir: str, name: str, sql: str, col: str, vals):
    qdir = os.path.join(out_dir, name)
    os.makedirs(qdir, exist_ok=True)
    pq.write_table(pa.table({col: pa.array(vals, type=pa.int64())}),
                   os.path.join(qdir, "part-0.parquet"))
    return name, sql


def run_gate(out_dir: str, env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    with tempfile.TemporaryDirectory() as empty_sf:
        p = subprocess.run([sys.executable, GATE, empty_sf, out_dir],
                           capture_output=True, text=True, env=env)
    return p.returncode, p.stdout


def main() -> int:
    failures = []

    # Case 1: well-behaved oracle, generous budgets -> PASS.
    with tempfile.TemporaryDirectory() as out:
        n, s = write_case(out, "q_good",
                          "SELECT CAST(1 AS BIGINT) AS x", "x", [1])
        json.dump({n: s}, open(os.path.join(out, "oracle_sql.json"), "w"))
        rc, log = run_gate(out, {})
        if rc != 0 or "PASS  q_good" not in log:
            failures.append(f"good fixture should pass, rc={rc}\n{log}")

    # Case 2: pathological recursive-CTE oracle (the r12 class: the
    # oracle COMPLETES but its execution wall alone would exhaust the
    # driver's verify budget) with a 0.05 s per-oracle budget -> FAIL.
    # 5k steps ~ 0.6 s in DuckDB (recursive CTEs execute one row per
    # pipeline pass, ~8k rows/s measured) — pathological per unit work,
    # cheap enough for the fixture to trip a 0.05 s budget fast.
    slow_sql = ("WITH RECURSIVE r AS (SELECT 1 AS i UNION ALL "
                "SELECT i + 1 FROM r WHERE i < 5000) "
                "SELECT CAST(max(i) AS BIGINT) AS x FROM r")
    with tempfile.TemporaryDirectory() as out:
        n, s = write_case(out, "q_pathological", slow_sql, "x", [5000])
        json.dump({n: s}, open(os.path.join(out, "oracle_sql.json"), "w"))
        rc, log = run_gate(out, {"GRAFT_SLOW_ORACLE_S": "0.05"})
        if rc == 0 or "SLOW oracle" not in log:
            failures.append(f"pathological oracle should trip the per-oracle "
                            f"gate, rc={rc}\n{log}")

    # Case 3: individually-fast oracles whose SUM exceeds the sweep
    # budget -> FAIL on _sweep even with no per-oracle trip.
    with tempfile.TemporaryDirectory() as out:
        oracles = {}
        for i in range(3):
            n, s = write_case(out, f"q_fast{i}",
                              "SELECT CAST(1 AS BIGINT) AS x", "x", [1])
            oracles[n] = s
        json.dump(oracles, open(os.path.join(out, "oracle_sql.json"), "w"))
        rc, log = run_gate(out, {"GRAFT_SLOW_ORACLE_S": "10.0",
                                 "GRAFT_TOTAL_ORACLE_S": "0.0"})
        if rc == 0 or "SLOW sweep" not in log:
            failures.append(f"sweep budget should trip, rc={rc}\n{log}")

    if failures:
        for f in failures:
            print("GATE-TEST FAIL:", f)
        return 1
    print("GATE-TEST PASS: per-oracle tripwire, sweep tripwire, "
          "and clean-pass path all behave")
    return 0


if __name__ == "__main__":
    sys.exit(main())

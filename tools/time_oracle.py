#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB and enforce the gate-economics budget.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> [perQueryBudgetSecs] [totalBudgetSecs]

The driver's correctness gate runs each oracle sequentially with a finite
round budget; rounds 7-9 produced empty/truncated CORRECTNESS artifacts
because individual oracles ran for minutes (dedup_clusters_embedding: ~20
min before the MATERIALIZED fix). This tool is the standing guard: it
fails (exit 1) if any single oracle exceeds the per-query budget
(default 20 s) or the sequential total exceeds the total budget
(default 240 s). Run it at round close; a new gate entry that ships an
unaffordable oracle must fail here, not in the driver.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    per_budget = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    total_budget = float(sys.argv[4]) if len(sys.argv) > 4 else 240.0
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(oracle_path).read_text())
    times = {}
    total = 0.0
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
            dt = time.time() - t0
        except Exception as e:
            print(f"ERR  {name}: {e}")
            times[name] = -1.0
            continue
        times[name] = dt
        total += dt
        flag = " **OVER**" if dt > per_budget else ""
        print(f"{dt:8.2f}s  {name}{flag}", flush=True)
    print(f"\nTOTAL {total:.1f}s over {len(times)} oracles "
          f"(budget: {per_budget:.0f}s/query, {total_budget:.0f}s total)")
    over = {n: t for n, t in times.items() if t > per_budget}
    errs = [n for n, t in times.items() if t < 0]
    for n, t in sorted(over.items(), key=lambda kv: -kv[1]):
        print(f"OVER-BUDGET {n}: {t:.1f}s")
    for n in errs:
        print(f"ORACLE-ERROR {n}")
    if over or errs or total > total_budget:
        sys.exit(1)


if __name__ == "__main__":
    main()

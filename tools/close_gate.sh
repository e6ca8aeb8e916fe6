#!/usr/bin/env bash
# Round-close gate replica: run the full correctness pipeline the way the
# driver does, PLUS the oracle-cost budget guard (SCALE.md "Gate economics").
# Usage: tools/close_gate.sh [sfDir] [outDir]
# Exit nonzero if any query fails its oracle OR any oracle exceeds the
# per-query (20 s) / total (240 s) DuckDB budget.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft-close-gate}"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null
ls "$OUT"/*.err 2>/dev/null && { echo "VERIFY ERRORS ^"; exit 1; }
python3 tools/check_oracle.py "$SF" "$OUT" CORRECTNESS_LOCAL.json
python3 tools/time_oracle.py "$SF" "$OUT/oracle_sql.json" 20 240
echo "close gate: ALL GREEN"

#!/usr/bin/env bash
# Round-close gate replica: run the full correctness pipeline the way the
# driver does, PLUS the oracle-cost budget guard (SCALE.md "Gate economics"),
# PLUS the scale-generality sweep: after the primary SF passes, the whole
# gate re-runs at a SECOND scale factor (default sf0.001) so any
# fixture-constant threshold, hash-width assumption, or size-dependent
# tie-break fails STRUCTURALLY instead of by convention (SCALE.md
# "Two-SF gate proof" — manual in rounds 11-12, standing here since 13).
# Usage: tools/close_gate.sh [sfDir] [outDir] [altSfDir]
#   altSfDir: second scale factor, or "none" to skip the sweep.
# Exit nonzero if any query fails its oracle at EITHER scale factor OR any
# oracle exceeds the per-query (20 s) / total (240 s) DuckDB budget.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft-close-gate}"
ALT="${3:-/root/testdata/sf0.001}"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null
ls "$OUT"/*.err 2>/dev/null && { echo "VERIFY ERRORS ^"; exit 1; }
python3 tools/check_oracle.py "$SF" "$OUT" CORRECTNESS_LOCAL.json
python3 tools/time_oracle.py "$SF" "$OUT/oracle_sql.json" 20 240
if [ "$ALT" != "none" ] && [ -d "$ALT" ]; then
  echo "close gate: primary SF green; scale-generality sweep at $ALT"
  rm -rf "$OUT-alt"
  sbt -batch "runMain graft.Verify $ALT $OUT-alt" >/dev/null
  ls "$OUT-alt"/*.err 2>/dev/null && { echo "VERIFY ERRORS (alt SF) ^"; exit 1; }
  python3 tools/check_oracle.py "$ALT" "$OUT-alt" /tmp/graft-close-gate-alt.json
fi
echo "close gate: ALL GREEN"

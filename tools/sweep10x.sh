#!/usr/bin/env bash
# Oracle-check every query output under a 10x-fixture Verify dir, one
# DuckDB process per query (isolated OOM/timeouts), appending one status
# line each to $OUT. Usage: sweep10x.sh <fixtureDir> <verifyOutDir> <outFile> [memLimit]
# Requires <verifyOutDir>/oracle_sql.json to be the FULL map (restore it
# from a full sf0.01 Verify run if the sweep was resumed/filtered).
# memLimit defaults to 48GB (the 10x sweep's cap); the 30x record runs
# at 100GB per VERDICT r15 task 4.
set -u
FIX=${1:-/tmp/graft_sf1b}
VOUT=${2:-/tmp/verify10x}
OUT=${3:-/tmp/sweep10x_results.txt}
MEM=${4:-48GB}
: > "$OUT"
export GRAFT_DUCKDB_NO_ORDER=1
for d in "$VOUT"/*/; do
  q=$(basename "$d")
  [ -f "$d/_SUCCESS" ] || { echo -e "$q\tNO_OUTPUT" >> "$OUT"; continue; }
  timeout 1200 python3 "$(dirname "$0")/oracle_check_one.py" "$FIX" "$VOUT" "$q" "$MEM" >> "$OUT" 2>&1 \
    || echo -e "$q\tCHECKER_EXIT_$?" >> "$OUT"
done
echo "== done: $(grep -c "	OK" "$OUT") OK / $(wc -l < "$OUT") total ==" >> "$OUT"

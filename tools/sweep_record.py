#!/usr/bin/env python3
"""Build a CORRECTNESS_sf1fixture_r{N}.json record from a sweep10x.sh
results file, deriving ok/total/oracle_side_failures FROM the per-query
map at write time — the summary can never drift from its own contents
(the round-11 hygiene finding: hand-maintained counters went stale as
entries were appended, leaving 'ok: 172/172' over a 188-entry map).

Usage: sweep_record.py <sweep_results.txt> <round> <fixture-desc> [notes]
Writes JSON to stdout. Status taxonomy follows oracle_check_one.py:
OK / ROWS_ONLY count as green; ORACLE_SQL_ERROR / CHECKER_EXIT_* are
oracle-side failures; everything else is an engine-side failure.
"""
import json
import sys

results, rnd, fixture = sys.argv[1], int(sys.argv[2]), sys.argv[3]
notes = sys.argv[4] if len(sys.argv) > 4 else ""

queries = {}
with open(results) as f:
    for line in f:
        line = line.rstrip("\n")
        if not line or line.startswith("=="):
            continue
        parts = line.split("\t")
        if len(parts) < 2:
            continue
        name, status = parts[0], parts[1]
        detail = parts[2] if len(parts) > 2 else None
        queries[name] = status if detail is None else f"{status}\t{detail}"

def status_of(v):
    return v.split("\t")[0]

ok = sum(1 for v in queries.values() if status_of(v) in ("OK", "ROWS_ONLY"))
oracle_side = sum(1 for v in queries.values()
                  if status_of(v) == "ORACLE_SQL_ERROR"
                  or status_of(v).startswith("CHECKER_EXIT"))
# Documented skips (status SKIPPED_*): a per-query analysis in SCALE.md
# explains why the fixture density makes the line infeasible for BOTH
# the engine and its algebraically-identical twin — an explicit record
# row, distinct from a failure and from a silent gap.
skipped = sum(1 for v in queries.values()
              if status_of(v).startswith("SKIPPED"))
# ORACLE_PENDING: engine output exists, the per-query DuckDB check is
# still queued in an in-flight sweep — an interim-record state, never a
# verdict. A finished record must have zero of these.
pending = sum(1 for v in queries.values()
              if status_of(v) == "ORACLE_PENDING")
record = {
    "fixture": fixture,
    "round": rnd,
    "ok": ok,
    "total": len(queries),
    "documented_skips": skipped,
    "oracle_pending": pending,
    "oracle_side_failures": oracle_side,
    "engine_side_failures": len(queries) - ok - oracle_side - skipped - pending,
    "notes": notes,
    "queries": dict(sorted(queries.items())),
}
json.dump(record, sys.stdout, indent=1)
print()

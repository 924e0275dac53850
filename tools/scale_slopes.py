#!/usr/bin/env python3
"""Render SCALE.md's scaling-slope table from two Bench JSON records.

Usage: scale_slopes.py BENCH_SF01.json BENCH_SF1.json [top_n]

Slope = t(sf1) / t(sf0.1) for a 10x data scale-up: ~1 means the cost is
dominated by fixed overhead (scheduling floor), ~10 is linear, >>10 is
the earliest 100x-scale warning this sandbox can give.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f.read().splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    a = load(sys.argv[1])  # sf0.1
    b = load(sys.argv[2])  # sf1 (10x)
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    qa, qb = a["queries"], b["queries"]
    common = [q for q in qb if q in qa and isinstance(qa[q], (int, float))
              and isinstance(qb[q], (int, float))]
    # Rank by sf1 cost — the queries that matter at scale.
    common.sort(key=lambda q: -qb[q])
    print("| query | sf0.1 (s) | sf1-fixture (s) | slope (10x data) |")
    print("|---|---|---|---|")
    for q in common[:top_n]:
        slope = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {slope:.1f}x |")
    fails = {q: v for q, v in qb.items() if not isinstance(v, (int, float))}
    if fails:
        print()
        print("Failed at sf1-fixture: " + ", ".join(sorted(fails)))
    tot_a = sum(v for v in qa.values() if isinstance(v, (int, float)))
    tot_b = sum(v for v in qb.values() if isinstance(v, (int, float)))
    print()
    print(f"Totals: sf0.1 {tot_a:.1f}s -> sf1-fixture {tot_b:.1f}s "
          f"({tot_b / tot_a:.1f}x for 10x data)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev tooling: build the BASELINE.md per-query bench table.

Usage:
  1. 3x: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" | grep '"metric"' > /tmp/bench_sN.json
  2. oracle timings (min of 2) into /tmp/oracle_times.json — see tools/oracle_times.py
  3. python3 tools/bench_table.py
"""
import json, sys

samples = [json.load(open(f'/tmp/bench_s{i}.json')) for i in (1, 2, 3)]
oracle = json.load(open('/tmp/oracle_times.json'))

names = list(samples[0]['queries'].keys())
best = {n: min(s['queries'][n] for s in samples) for n in names}
total = sum(best.values())
otot = sum(oracle.values())

rows = []
over = []
for n in names:
    o = oracle.get(n)
    if o is None:
        rows.append(f"| {n} | {best[n]:.2f} | — | — | rows-only query |")
    else:
        ratio = best[n] / o if o > 0 else float('inf')
        r = f"{ratio:.2f}" if ratio < 100 else f"{ratio:.0f}"
        rows.append(f"| {n} | {best[n]:.2f} | {o:.2f} | {r} | ok |")
        if ratio > 2 and best[n] > 1.0:
            over.append((n, best[n], o, ratio))

print(f"HEADLINE: Spark total {total:.1f} s vs oracle total {otot:.1f} s = {total/otot:.2f}x  ({len(names)} queries)")
print("OVER 2x AND over 1s:", over)
print()
print("| query | spark sec (sf0.1) | oracle sec (sf0.1) | ratio | status |")
print("|---|---|---|---|---|")
print("\n".join(rows))

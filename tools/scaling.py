#!/usr/bin/env python3
"""Scaling-exponent table from two Bench runs at different scale factors.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> <ratio>

Reads the full-precision `target/bench.json` artifacts (the `queries` map),
prints a markdown table sorted by exponent descending:
  exponent = log(t_big / t_small) / log(ratio)
~1.0 = linear scaling, <1 = sublinear (fixed overheads amortize),
>1 = superlinear (needs a named cause). Queries missing from either run
(excluded or failed) are listed separately so the table can't silently
shrink its surface.
"""
import json, math, sys

small, big, ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
a = json.load(open(small))["queries"]
b = json.load(open(big))["queries"]

rows, missing = [], []
for q in sorted(set(a) | set(b)):
    ta, tb = a.get(q), b.get(q)
    if ta is None or tb is None or ta <= 0 or tb <= 0:
        missing.append(q)
        continue
    rows.append((q, ta, tb, math.log(tb / ta) / math.log(ratio)))

rows.sort(key=lambda r: -r[3])
print("| query | t_small (s) | t_big (s) | exponent |")
print("|---|---|---|---|")
for q, ta, tb, e in rows:
    print(f"| {q} | {ta:.2f} | {tb:.2f} | {e:.2f} |")
if missing:
    print(f"\nmissing from one side (excluded/failed): {', '.join(missing)}")
tot_a = sum(r[1] for r in rows)
tot_b = sum(r[2] for r in rows)
print(f"\ncommon-set totals: {tot_a:.1f}s -> {tot_b:.1f}s "
      f"(exponent {math.log(tot_b / tot_a) / math.log(ratio):.2f})")

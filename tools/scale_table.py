#!/usr/bin/env python3
"""Build the SCALE.md per-query ratio table from two Bench JSON lines.

Usage: scale_table.py bench_small.json bench_large.json [data_ratio]
Flags queries whose wall-clock grew more than FLAG_RATIO (default 15x,
i.e. 10x data + shuffle/sort overhead headroom).
"""
import json, sys

small = json.load(open(sys.argv[1]))
large = json.load(open(sys.argv[2]))
flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

rows = []
for name, t_small in small["queries"].items():
    t_large = large["queries"].get(name)
    if t_large is None:
        continue
    ratio = t_large / t_small if t_small > 0 else float("inf")
    rows.append((name, t_small, t_large, ratio))

rows.sort(key=lambda r: -r[3])
print(f"| query | {small['sf'].split('/')[-1]} (s) | {large['sf'].split('/')[-1]} (s) | ratio | note |")
print("|---|---|---|---|---|")
for name, a, b, r in rows:
    note = "**FLAG**" if r > flag_ratio else ""
    print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x | {note} |")
print()
print(f"total: {small['value']:.1f}s -> {large['value']:.1f}s "
      f"({large['value']/small['value']:.1f}x)")

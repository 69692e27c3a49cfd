#!/usr/bin/env python3
"""Build the per-query scaling table between two bench_full.json maps.

Usage: scale_table.py <lo.json> <hi.json> <lo_label> <hi_label> [top_n]

Prints a markdown table of the top_n largest hi/lo ratios (default 15)
plus summary stats. Used for SCALE_sf1.md / SCALE evidence docs.
"""
import json, sys

lo_path, hi_path, lo_label, hi_label = sys.argv[1:5]
top_n = int(sys.argv[5]) if len(sys.argv) > 5 else 15
lo = json.load(open(lo_path))["queries"]
hi = json.load(open(hi_path))["queries"]
shared = sorted(set(lo) & set(hi))
rows = []
for k in shared:
    if lo[k] > 0:
        rows.append((hi[k] / lo[k], k, lo[k], hi[k]))
rows.sort(reverse=True)
tl = sum(lo[k] for k in shared)
th = sum(hi[k] for k in shared)
print(f"shared queries: {len(shared)}; total {lo_label}: {tl:.1f}s, "
      f"{hi_label}: {th:.1f}s, ratio {th/tl:.2f}x")
import statistics
print(f"median ratio: {statistics.median(r[0] for r in rows):.2f}x; "
      f">10x count: {sum(1 for r in rows if r[0] > 10)}")
print()
print(f"| query | {lo_label} s | {hi_label} s | ratio |")
print("|---|---|---|---|")
for ratio, k, a, b in rows[:top_n]:
    print(f"| {k} | {a:.3f} | {b:.3f} | {ratio:.1f}x |")

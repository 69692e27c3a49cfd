#!/usr/bin/env python3
"""Full per-query bench diff — the drift guard the fixed headline set
cannot provide.

The bench line's headline is a fixed subset ∪ the run's top-5, so a slow
creep in a non-headline query stays invisible until it is expensive
enough to crack top-5. This script diffs the COMPLETE first-pass
per-query map of two bench_full.json files and prints every mover past
a threshold (default 30%), plus added/removed queries, so each round's
record ships with the full-map drift check.

Usage:
  python3 tools/bench_diff.py OLD_bench_full.json NEW_bench_full.json [--pct 30] [--min-abs 0.05]

Movers smaller than --min-abs seconds are suppressed regardless of
percentage (a 0.02 s -> 0.03 s query is +50% and meaningless on this
box; see the ±10% total-variance note in the bench telemetry).
Exit code is 0 always — the diff is a report, not a gate; per-query
deltas still need the env telemetry (load1, min2/first) read alongside.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    env = d.get("env", {})
    return {k: float(v) for k, v in qs.items()}, env, d.get("total")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=30.0,
                    help="report movers past this percentage (default 30)")
    ap.add_argument("--min-abs", type=float, default=0.05,
                    help="suppress movers below this absolute delta in seconds")
    args = ap.parse_args()

    old, oenv, ototal = load(args.old)
    new, nenv, ntotal = load(args.new)

    print(f"old: {args.old}  total={ototal}  env={oenv}")
    print(f"new: {args.new}  total={ntotal}  env={nenv}")
    for name, env in (("old", oenv), ("new", nenv)):
        try:
            if float(env.get("load1_start", 0)) > 1.5 or float(env.get("min2_first_ratio", 1)) < 0.7:
                print(f"WARNING: {name} run looks contended (load1_start>1.5 or "
                      f"min2/first<0.7) — treat its deltas as suspect")
        except (TypeError, ValueError):
            pass

    movers = []
    for q in sorted(set(old) & set(new)):
        d = new[q] - old[q]
        pct = 100.0 * d / old[q] if old[q] > 0 else float("inf")
        if abs(pct) >= args.pct and abs(d) >= args.min_abs:
            movers.append((pct, d, q))
    movers.sort(key=lambda t: -abs(t[0]))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    if movers:
        print(f"\nmovers ≥{args.pct:.0f}% and ≥{args.min_abs}s ({len(movers)}):")
        for pct, d, q in movers:
            print(f"  {q:45s} {old[q]:8.3f} -> {new[q]:8.3f}  {d:+7.3f}s {pct:+7.1f}%")
    else:
        print(f"\nno movers ≥{args.pct:.0f}% and ≥{args.min_abs}s")
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(f"{q}={new[q]:.3f}s" for q in added))
    if removed:
        print(f"\nremoved ({len(removed)}): " + ", ".join(f"{q}={old[q]:.3f}s" for q in removed))

    both = set(old) & set(new)
    so, sn = sum(old[q] for q in both), sum(new[q] for q in both)
    print(f"\nshared-query sum: {so:.1f}s -> {sn:.1f}s ({100.0 * (sn - so) / so:+.1f}%)"
          if so > 0 else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())

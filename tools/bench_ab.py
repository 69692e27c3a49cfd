#!/usr/bin/env python3
"""Interleaved adjacent A/B bench: HEAD vs a prior-round worktree binary.

This box swings 2x against itself between box states (SCALE.md round-14
bisect), so raw round-over-round bench totals are not comparable; the only
honest comparison is ADJACENT, INTERLEAVED runs of both binaries in one
window. This tool automates the round-14 manual protocol (COVERAGE.md
handoff / VERDICT round-14 "Next round" #2).

Usage:
  python3 tools/bench_ab.py <prior_worktree_dir> [--pairs N] [--sf DIR]
                            [--cpus N] [--out FILE]

The prior worktree must already exist and compile (e.g.
`git worktree add /root/wt_r14 <commit> && (cd /root/wt_r14 && sbt compile)`).
Runs Bench alternately (A=HEAD repo, B=worktree) `pairs` times, collects
each run's bench_full.json, and emits per-query paired stats over the
shared key set: for each side the per-query MIN across its runs (the
noise-robust statistic the bench's own min-of-2 headline uses), the
A/B ratio, and the shared-sum ratio. Output JSON also keeps every raw
run so nothing is hidden.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cwd, sf, cpus):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       capture_output=True, text=True, cwd=cwd, env=env)
    if "[success]" not in r.stdout:
        print(r.stdout[-3000:], file=sys.stderr)
        print(r.stderr[-1000:], file=sys.stderr)
        raise SystemExit(f"bench failed in {cwd}")
    with open(os.path.join(cwd, "bench_full.json")) as f:
        full = json.load(f)
    # the env telemetry rides in bench_full.json too
    return {"queries": {k: float(v) for k, v in full["queries"].items()},
            "total": float(full["total"]), "env": full.get("env", {})}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("worktree")
    p.add_argument("--pairs", type=int, default=2)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--out", default=os.path.join(REPO, "bench_ab.json"))
    a = p.parse_args()

    runs = {"A": [], "B": []}
    for i in range(a.pairs):
        for side, cwd in (("A", REPO), ("B", a.worktree)):
            print(f"[ab] pair {i + 1}/{a.pairs} side {side} ({cwd})", flush=True)
            r = run_bench(cwd, a.sf, a.cpus)
            print(f"[ab]   total={r['total']:.1f}s env={r['env']}", flush=True)
            runs[side].append(r)

    shared = sorted(set.intersection(
        *[set(r["queries"]) for r in runs["A"] + runs["B"]]))
    per_q = {}
    for q in shared:
        amin = min(r["queries"][q] for r in runs["A"])
        bmin = min(r["queries"][q] for r in runs["B"])
        per_q[q] = {"a_min": round(amin, 3), "b_min": round(bmin, 3),
                    "ratio": round(amin / bmin, 3) if bmin > 0 else None}
    asum = sum(v["a_min"] for v in per_q.values())
    bsum = sum(v["b_min"] for v in per_q.values())
    out = {
        "sf": a.sf, "cpus": a.cpus, "pairs": a.pairs,
        "worktree": a.worktree,
        "shared_min_sum": {"head": round(asum, 2), "prior": round(bsum, 2),
                           "ratio": round(asum / bsum, 4)},
        "per_query_min": per_q,
        "raw": {side: [{"total": r["total"], "env": r["env"],
                        "queries": r["queries"]} for r in rs]
                for side, rs in runs.items()},
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[ab] shared-min sum: HEAD {asum:.1f}s vs prior {bsum:.1f}s "
          f"(ratio {asum / bsum:.3f}) -> {a.out}")
    movers = sorted(per_q.items(),
                    key=lambda kv: kv[1]["a_min"] - kv[1]["b_min"])
    for q, v in movers[:12] + movers[-6:]:
        print(f"[ab] {v['a_min'] - v['b_min']:+7.3f}s  {q} "
              f"({v['b_min']} -> {v['a_min']})")


if __name__ == "__main__":
    main()

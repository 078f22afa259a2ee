"""Interleaved A/B bench legs: the contention-robust wall-clock
instrument for this box (r12 methodology; VERDICT r12 items 1/4/6).

Runs bench.py subsets alternating between two checkouts (A = baseline
worktree, B = this repo) for N legs each, records every leg's raw JSON
under bench_history/<outdir>/, and prints per-query min/median tables.
Interleaving bounds temporally-local box noise to at most one leg per
side; the per-query MIN across legs is the least-contaminated sample
(random steal only ever adds time).

Usage:
  python tools/ab_bench.py --queries q1,q2 --baseline /tmp/wt_r11 \
      --legs 3 --repeats 1 --outdir ab_r13_stream
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(checkout: str, queries: str, repeats: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY=queries,
        SPARK_GRAFT_BENCH_REPEATS=str(repeats),
        SPARK_GRAFT_SF_DIR=sf_dir,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(checkout, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=checkout,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"no JSON from bench leg in {checkout}: tail={proc.stdout[-500:]!r} "
        f"err={proc.stderr[-500:]!r}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, help="comma-separated query names")
    ap.add_argument("--baseline", required=True, help="baseline checkout path (A side)")
    ap.add_argument("--legs", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default="ab_r13")
    args = ap.parse_args()

    outdir = os.path.join(ROOT, "bench_history", args.outdir)
    os.makedirs(outdir, exist_ok=True)
    legs: dict[str, list[dict]] = {"old": [], "new": []}
    for leg in range(1, args.legs + 1):
        # alternate which side runs first: this box throttles under
        # sustained load, so a fixed old-then-new order systematically
        # hands the second side a hotter box (the r12 objectHashAggregate
        # rejection caught exactly this when reversing the leg order
        # flipped the verdict)
        order = (("old", args.baseline), ("new", ROOT))
        if leg % 2 == 0:
            order = tuple(reversed(order))
        for side, checkout in order:
            res = run_leg(checkout, args.queries, args.repeats, args.sf_dir)
            legs[side].append(res)
            path = os.path.join(outdir, f"ab_{side}_{leg}.json")
            with open(path, "w") as fh:
                json.dump(res, fh)
            print(f"leg {leg} {side}: {res.get('queries')}", flush=True)

    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    print(f"\n{'query':35s} {'old min':>8s} {'new min':>8s} {'min x':>6s} "
          f"{'old med':>8s} {'new med':>8s} {'med x':>6s}")
    for name in names:
        old = [r["queries"][name] for r in legs["old"] if name in r.get("queries", {})]
        new = [r["queries"][name] for r in legs["new"] if name in r.get("queries", {})]
        if not old or not new:
            print(f"{name:35s} (missing on one side)")
            continue
        om, nm = min(old), min(new)
        omed, nmed = statistics.median(old), statistics.median(new)
        print(
            f"{name:35s} {om:8.3f} {nm:8.3f} {om / nm:6.2f} "
            f"{omed:8.3f} {nmed:8.3f} {omed / nmed:6.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

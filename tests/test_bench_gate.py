"""Round-over-round bench regression gate.

Diffs the two most recent archived full-suite bench runs
(``bench_history/bench_<ts>_sf0.1.json``, written by bench.py after every
complete sf0.1 run) with tools/bench_diff.py's measured 1.4x threshold.
Because ~199 per-query medians at a p90 run-to-run noise ratio of 1.28
will occasionally throw a lone >1.4x outlier, a flagged query is not an
immediate failure: the gate re-runs the flagged queries FRESH (a bench.py
subprocess via SPARK_GRAFT_BENCH_ONLY, same local[32] harness and warmup
as the archived runs) and fails only when the fresh median still sits
>=1.4x above the OLD archive. Every run writes the full report to
``BENCH_DIFF_latest.txt`` at the repo root so a regression reds a visible
artifact, not just a log line (VERDICT r08 item 3).
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"
MAX_CONFIRM = 8  # bound the fresh-confirm cost; worst offenders first


def _bench_diff():
    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(ROOT, "tools", "bench_diff.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_round_gate():
    files = sorted(glob.glob(os.path.join(ROOT, "bench_history", "bench_*_sf0.1.json")))
    if len(files) < 2:
        pytest.skip("need two archived full sf0.1 bench runs in bench_history/")
    old_path, new_path = files[-2], files[-1]
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)

    result = _bench_diff().compare(old, new)
    report = [
        f"old: {os.path.basename(old_path)}",
        f"new: {os.path.basename(new_path)}",
        *result["lines"],
    ]

    confirmed = []
    flagged = sorted(result["regressions"], reverse=True)[:MAX_CONFIRM]
    if len(result["regressions"]) > MAX_CONFIRM:
        report.append(
            f"note: {len(result['regressions'])} regressions flagged; "
            f"fresh-confirming only the worst {MAX_CONFIRM}"
        )
    if flagged:
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ONLY=",".join(name for _, name, _, _ in flagged),
            SPARK_GRAFT_SF_DIR=SF_DIR,
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
            cwd=ROOT,
        )
        fresh: dict = {}
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                fresh = json.loads(line).get("queries", {})
                break
            except json.JSONDecodeError:
                continue
        for ratio, name, a, b in flagged:
            f_med = fresh.get(name, -1.0)
            if f_med is None or f_med <= 0:
                confirmed.append((name, a, b, f_med))
                report.append(
                    f"CONFIRMED {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh re-run failed or missing"
                )
            elif f_med / a >= 1.4:
                confirmed.append((name, a, b, f_med))
                report.append(
                    f"CONFIRMED {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh median {f_med}s ({f_med / a:.2f}x vs old)"
                )
            else:
                report.append(
                    f"refuted {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh median {f_med}s ({f_med / a:.2f}x vs old) — noise"
                )

    with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
        fh.write("\n".join(report) + "\n")
    assert not confirmed, "\n".join(report)

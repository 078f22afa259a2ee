"""Compare two bench result files and flag real per-query regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

Reads the ``queries`` map (per-query seconds — medians for round-8+ files,
single-run for older ones) from each file and prints queries whose ratio
exceeds the threshold in either direction. The default threshold 1.4 sits
just above the measured median-of-3 noise floor on this box (back-to-back
sf0.1 runs: per-query median ratio 1.15, p90 1.28 — see README bench
note); under the old single-run bench individual queries swung 3.4x, so
nothing under ~3x was signal. Queries where BOTH sides sit under
``min_sec`` (default 0.3s) are skipped — fixed scheduling overhead
dominates them and their ratios are meaningless — but a query that
crosses the floor in either direction still flags. When both files carry
``n_samples`` maps, queries compared across unequal sample counts get a
note (budget-truncated tails are medians of fewer, colder samples).

Exit code 1 when regressions (new slower than old) are found, so the diff
can gate a CI step; speedups are listed but don't fail.
"""

from __future__ import annotations

import json
import sys


def compare(old: dict, new: dict, threshold: float = 1.4, min_sec: float = 0.3) -> dict:
    """Diff two parsed bench results; returns lines + (ratio, name, a, b) lists.

    Pure so the round-gate test (tests/test_bench_gate.py) can reuse the
    exact CLI semantics against archived bench_history/ files.
    """
    lines: list[str] = []
    if old.get("estimator") != new.get("estimator"):
        lines.append(
            f"WARNING: estimator mismatch ({old.get('estimator', 'single_run')} "
            f"vs {new.get('estimator', 'single_run')}) — single-run numbers "
            "carry 3x+ per-query noise; ratios below are not reliable signal"
        )

    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    regressions, speedups = [], []
    on, nn = old.get("n_samples", {}), new.get("n_samples", {})
    for name in shared:
        a, b = oq[name], nq[name]
        # skip only when BOTH sides sit under the noise floor: a regression
        # that crosses it (0.25s -> 4.0s) must still flag
        if max(a, b) < min_sec or a <= 0 or b <= 0:
            continue
        flagged = False
        if b / a >= threshold:
            regressions.append((b / a, name, a, b))
            flagged = True
        elif a / b >= threshold:
            speedups.append((a / b, name, a, b))
            flagged = True
        # the unequal-samples caveat only matters for queries that actually
        # drifted — emitting it for every truncated-tail query buries the
        # REGRESSION lines the report exists to surface
        if flagged and name in on and name in nn and on[name] != nn[name]:
            lines.append(
                f"note: {name} compared across unequal sample counts "
                f"({on[name]} vs {nn[name]}) — truncated-tail medians "
                "include the cold pass-1 sample and bias slower"
            )

    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        lines.append(
            f"suite total: {ot}s -> {nt}s ({nt / ot:.2f}x), {len(shared)} shared queries"
        )
    for label, rows in (("REGRESSION", regressions), ("speedup", speedups)):
        for r, name, a, b in sorted(rows, reverse=True):
            lines.append(f"{label} {name}: {a}s -> {b}s ({r:.2f}x)")
    if not regressions and not speedups:
        lines.append(f"no per-query drift beyond {threshold}x")
    return {"lines": lines, "regressions": regressions, "speedups": speedups}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.4

    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    result = compare(old, new, threshold)
    for line in result["lines"]:
        print(line)
    return 1 if result["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())

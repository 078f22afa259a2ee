"""Round-over-round bench regression gate.

Diffs the two most recent archived full-suite bench runs
(``bench_history/bench_<ts>_sf0.1.json``, written by bench.py after every
complete sf0.1 run) with tools/bench_diff.py's measured 1.4x threshold.
Two layers of noise rejection, both grounded in measured instrument
behavior (README bench note):

* UNIFORM BOX DRIFT: back-to-back identical-code runs differ by up to
  ~15% in suite total (a box-speed swing spread over every query — e.g.
  totals 181.7s vs 209.0s observed round 9). The flag threshold is
  scaled by the shared-query total ratio, capped at 1.3x so a genuinely
  broad code slowdown cannot hide behind the drift allowance.
* PER-QUERY NOISE: ~199 medians at a p90 run-to-run ratio of 1.28 will
  occasionally throw a lone >1.4x outlier. A flagged query is re-run
  FRESH (a bench.py subprocess via SPARK_GRAFT_BENCH_ONLY, same
  local[32] harness and warmup as the archived runs) alongside three
  stable REFERENCE queries; the references' median fresh/old ratio
  estimates the box drift at confirm time, and the flag fails only when
  the drift-normalized fresh ratio still exceeds 1.4x.

Every run writes the full report to ``BENCH_DIFF_latest.txt`` at the
repo root so a regression reds a visible artifact, not just a log line
(VERDICT r08 item 3).
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import statistics
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"
MAX_CONFIRM = 8  # bound the fresh-confirm cost; worst offenders first
# map-shaped, mid-cost, historically stable queries used to estimate box
# drift during the fresh-confirm run
REFERENCES = ["q1_pricing_summary", "join_star_broadcast", "text_quality"]
DRIFT_CAP = 1.3  # measured box swing band; a broader slowdown is code
# Per-query (ratio, delta_sec) confirm bars for queries whose OWN median
# is measurably unstable on identical code — each entry must cite idle-box
# measurements; don't add one to silence a flag you haven't measured.
# compact_roundtrip: e2e small-files write+compact+read roundtrip whose
# wall is FS/page-cache regime, not plan work — two back-to-back idle-box
# median-of-10 runs on identical code measured 1.857s vs 3.484s (1.88x
# swing of the MEDIAN itself; single samples span 1.46-3.5s), so the
# default 1.4x/0.3s bars flap. 2.2x/2.0s sits above the measured swing
# while a real regression (e.g. compaction degenerating to per-file jobs)
# still clears it trivially.
VARIANCE_OVERRIDES = {"compact_roundtrip": (2.2, 2.0)}


def _bench_diff():
    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(ROOT, "tools", "bench_diff.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bench_guard():
    spec = importlib.util.spec_from_file_location(
        "bench_guard", os.path.join(ROOT, "tools", "bench_guard.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.round_gate
def test_bench_round_gate():
    files = sorted(glob.glob(os.path.join(ROOT, "bench_history", "bench_*_sf0.1.json")))
    # Contaminated archives (bench recorded inside a documented 2.2-2.8x
    # host-contention window) are quarantined, not diffed: diffing one
    # produces fake regressions (BENCH_r09, 391s on identical code) or —
    # as the old side — fake all-clears. Runs self-describe from r10 on;
    # legacy archives are retro-classified from their in-run reference
    # medians and budget-truncation shape (tools/bench_guard.py).
    guard = _bench_guard()
    calm_refs = guard.load_calm_refs(ROOT)
    quarantine_notes = []
    eligible = []
    trailing_quarantined = 0
    for path in files:
        with open(path) as f:
            arch = json.load(f)
        quarantined, reason = guard.classify_archive(arch, calm_refs)
        if quarantined:
            quarantine_notes.append(f"quarantined {os.path.basename(path)}: {reason}")
            trailing_quarantined += 1
        else:
            eligible.append((path, arch))
            trailing_quarantined = 0
    # A quarantine streak must not let the gate skip-green forever
    # (ADVICE r10 item 1): with the synthetic spark.range probe a real
    # code slowdown no longer self-marks contaminated, so a long streak
    # means either genuine multi-day box chaos or a broken instrument —
    # both need a human. Warn at 3; fail hard at 8.
    if trailing_quarantined >= 3:
        quarantine_notes.append(
            f"WARNING: {trailing_quarantined} consecutive newest archives "
            "quarantined — the gate has not diffed fresh code recently; "
            "investigate the box or the contamination instrument"
        )
    assert trailing_quarantined < 8, (
        f"{trailing_quarantined} consecutive quarantined archives: the gate "
        "would skip-green indefinitely; investigate instead of re-running"
    )
    if len(eligible) < 2:
        if quarantine_notes:
            with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
                fh.write("\n".join(quarantine_notes) + "\n")
        pytest.skip("need two non-quarantined full sf0.1 bench runs in bench_history/")
    (old_path, old), (new_path, new) = eligible[-2], eligible[-1]

    # uniform box drift over the shared queries scales the flag threshold
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = [k for k in oq.keys() & nq.keys() if oq[k] > 0 and nq[k] > 0]
    drift = sum(nq[k] for k in shared) / max(sum(oq[k] for k in shared), 1e-9)
    allowance = min(max(drift, 1.0), DRIFT_CAP)
    threshold = round(1.4 * allowance, 3)

    result = _bench_diff().compare(old, new, threshold)
    report = [
        *quarantine_notes,
        f"old: {os.path.basename(old_path)}",
        f"new: {os.path.basename(new_path)}",
        f"uniform drift over {len(shared)} shared queries: {drift:.3f}x "
        f"-> flag threshold {threshold}x (1.4 x capped allowance)",
        *result["lines"],
    ]

    confirmed = []
    flagged = sorted(result["regressions"], reverse=True)[:MAX_CONFIRM]
    # A BROAD flag share means either a broad CODE slowdown or a
    # contaminated-but-eligible new archive (r11 measured a many-small-
    # jobs contention mode that reads CALM on both repo-independent
    # probes, so self-description alone cannot rule this out). The
    # decisive instrument is a FRESH reference run against the committed
    # CALM medians — not against the old archive: a code regression this
    # broad necessarily slows the refs (they are suite queries) and
    # cannot read calm later, while a transient box window does.
    if len(result["regressions"]) >= max(10, len(shared) // 10):
        report.append(
            f"BROAD REGRESSION: {len(result['regressions'])} of "
            f"{len(shared)} shared queries exceed the drift-normalized "
            "threshold — disambiguating via fresh references vs CALM_REFS"
        )
        calm_vals = (calm_refs or {}).get("refs", {})
        fresh_vs_calm = None
        if calm_vals:
            env = dict(
                os.environ,
                SPARK_GRAFT_BENCH_ONLY=",".join(calm_vals),
                SPARK_GRAFT_SF_DIR=SF_DIR,
                SPARK_GRAFT_BENCH_REPEATS="5",
            )
            proc = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True, text=True, env=env, timeout=1800, cwd=ROOT,
            )
            fresh_refs: dict = {}
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    fresh_refs = json.loads(line).get("queries", {})
                    break
                except json.JSONDecodeError:
                    continue
            fresh_vs_calm = guard.drift_estimate(fresh_refs, calm_refs)
        if fresh_vs_calm is not None and fresh_vs_calm <= guard.LEGACY_REF_DRIFT:
            # fresh refs at calm disprove a persistent code regression:
            # the new archive was recorded inside a contention window the
            # probes missed. Retro-mark it so every future classification
            # quarantines it, and skip this diff.
            report.append(
                f"fresh references at {fresh_vs_calm}x of CALM_REFS disprove a "
                "persistent code regression; retro-quarantining the new archive "
                f"({os.path.basename(new_path)}) — its contention mode evaded "
                "the probes"
            )
            new["contaminated"] = True
            new["retro_quarantined"] = (
                f"gate: broad flags but fresh refs at {fresh_vs_calm}x of calm"
            )
            with open(new_path, "w") as fh:
                json.dump(new, fh)
            with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
                fh.write("\n".join(report) + "\n")
            pytest.skip(
                "broad flags traced to a contaminated archive (fresh refs calm); "
                "archive retro-quarantined — re-run the gate after the next bench"
            )
        report.append(
            "fresh references "
            + (f"at {fresh_vs_calm}x of CALM_REFS " if fresh_vs_calm else "unavailable ")
            + "— a broad code regression (or sustained multi-hour contention) "
            "cannot be ruled out; failing on the archive evidence"
        )
        with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
            fh.write("\n".join(report) + "\n")
        raise AssertionError("\n".join(report))
    if len(result["regressions"]) > MAX_CONFIRM:
        report.append(
            f"note: {len(result['regressions'])} regressions flagged; "
            f"fresh-confirming only the worst {MAX_CONFIRM}"
        )
    if flagged:
        names = [name for _, name, _, _ in flagged]
        refs = [r for r in REFERENCES if r in oq and oq[r] > 0 and r not in names]
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ONLY=",".join(names + refs),
            SPARK_GRAFT_SF_DIR=SF_DIR,
            # 5-sample medians: the confirm verdict hangs on few queries,
            # and sub-second ones need the extra samples to settle
            SPARK_GRAFT_BENCH_REPEATS="5",
        )

        def _fresh_run():
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
            return proc, fresh

        # This is a Firecracker guest: host/steal contention can slow the
        # whole box >2x for minutes at a time (measured 2.17x via the
        # reference queries on an OTHERWISE IDLE guest, load avg 2.5 with
        # zero user processes). A confirm window whose reference drift
        # exceeds this bound cannot adjudicate a 1.4x question under the
        # 1.3x-capped allowance — retry once, then record UNRESOLVED and
        # skip rather than confirm on an unmeasurable window. (A broad
        # CODE slowdown cannot hide here: it trips the many-flags guard
        # above before any confirm runs.)
        CONTAMINATED = 1.6
        for attempt in (1, 2):
            proc, fresh = _fresh_run()
            if not fresh or all(fresh.get(n, -1.0) <= 0 for n in names):
                # the confirm subprocess couldn't measure anything (no
                # testdata, broken env, transient OOM under the same host
                # contention that caused the flags): a missing measurement
                # is not a confirmation. A transient failure deserves the
                # same retry budget as a contaminated window (ADVICE r09);
                # only a second consecutive failure records UNRESOLVED.
                if attempt == 1:
                    report.append(
                        "fresh-confirm run produced no timings "
                        f"(rc={proc.returncode}); retrying once like a "
                        "contaminated window"
                    )
                    continue
                report.append(
                    "fresh-confirm run unavailable (bench subprocess produced no "
                    f"timings twice, rc={proc.returncode}); flags above are UNRESOLVED"
                )
                with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
                    fh.write("\n".join(report) + "\n")
                pytest.skip("bench fresh-confirm unavailable; flags unresolved (see BENCH_DIFF_latest.txt)")
            ref_ratios = [
                fresh[r] / oq[r] for r in refs if fresh.get(r, -1) and fresh.get(r, -1) > 0
            ]
            confirm_drift = statistics.median(ref_ratios) if ref_ratios else 1.0
            if confirm_drift <= CONTAMINATED or attempt == 2:
                break
            report.append(
                f"confirm window contaminated (reference drift "
                f"{confirm_drift:.3f}x > {CONTAMINATED}x — host/steal "
                "contention); retrying fresh confirm once"
            )
        if confirm_drift > CONTAMINATED:
            report.append(
                f"fresh-confirm box drift {confirm_drift:.3f}x still > "
                f"{CONTAMINATED}x after retry; flags above are UNRESOLVED "
                "(re-run the gate when the host calms down)"
            )
            with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
                fh.write("\n".join(report) + "\n")
            pytest.skip("bench confirm window contaminated twice; flags unresolved (see BENCH_DIFF_latest.txt)")
        confirm_allowance = min(max(confirm_drift, 1.0), DRIFT_CAP)
        report.append(
            f"fresh-confirm box drift via {len(ref_ratios)} references: "
            f"{confirm_drift:.3f}x -> confirm allowance {confirm_allowance:.3f}x"
        )
        for ratio, name, a, b in flagged:
            f_med = fresh.get(name, -1.0)
            if f_med is None or f_med <= 0:
                confirmed.append((name, a, b, f_med))
                report.append(
                    f"CONFIRMED {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh re-run failed or missing"
                )
                continue
            norm = f_med / (a * confirm_allowance)
            delta = f_med - a * confirm_allowance
            # both bars must clear: ratio >= 1.4 AND >= 0.3s absolute slowdown
            # after drift — this box's scheduling noise swings short queries
            # by ~0.2s (the same floor bench_diff's min_sec encodes), and a
            # regression that matters at scale clears 0.3s trivially.
            # Queries with a measured unstable median get their own bars
            # (VARIANCE_OVERRIDES above).
            bar_ratio, bar_delta = VARIANCE_OVERRIDES.get(name, (1.4, 0.3))
            bars = (
                f" [bars {bar_ratio}x/{bar_delta}s]"
                if name in VARIANCE_OVERRIDES
                else ""
            )
            if norm >= bar_ratio and delta >= bar_delta:
                confirmed.append((name, a, b, f_med))
                report.append(
                    f"CONFIRMED {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh median {f_med}s = {norm:.2f}x / +{delta:.2f}s vs old after drift{bars}"
                )
            else:
                report.append(
                    f"refuted {name}: archived {a}s -> {b}s ({ratio:.2f}x); "
                    f"fresh median {f_med}s = {norm:.2f}x / {delta:+.2f}s vs old after drift — noise{bars}"
                )

    with open(os.path.join(ROOT, "BENCH_DIFF_latest.txt"), "w") as fh:
        fh.write("\n".join(report) + "\n")
    assert not confirmed, "\n".join(report)


def _load_archive(name):
    path = os.path.join(ROOT, "bench_history", name)
    if not os.path.exists(path):
        pytest.skip(f"committed archive {name} absent")
    with open(path) as f:
        return json.load(f)


def test_guard_classifies_committed_archives():
    """The retro classifier, pinned against the real committed archives:
    the three calm r09 runs stay eligible, the driver's contaminated 391s
    run (BENCH_r09) is quarantined on BOTH legacy signals it carries."""
    guard = _bench_guard()
    calm = guard.load_calm_refs(ROOT)
    assert calm.get("refs"), "bench_history/CALM_REFS.json must be committed"
    for name in (
        "bench_1786810000_sf0.1.json",
        "bench_1786818963_sf0.1.json",
        "bench_1786829021_sf0.1.json",
    ):
        quarantined, reason = guard.classify_archive(_load_archive(name), calm)
        assert not quarantined, f"{name} wrongly quarantined: {reason}"
    quarantined, reason = guard.classify_archive(
        _load_archive("bench_1786862137_sf0.1.json"), calm
    )
    assert quarantined and "drift" in reason
    # drop its queries map: the truncation signal alone (168/201 queries
    # at a single sample) must still quarantine it
    arch = _load_archive("bench_1786862137_sf0.1.json")
    arch["queries"] = {}
    quarantined, reason = guard.classify_archive(arch, calm)
    assert quarantined and "truncated" in reason


def test_guard_trusts_self_description():
    """An r10+ archive's own contaminated marker wins over every legacy
    heuristic, in both directions."""
    guard = _bench_guard()
    calm = guard.load_calm_refs(ROOT)
    refs = calm["refs"]
    hot = {name: t * 3 for name, t in refs.items()}  # looks contaminated
    assert guard.classify_archive(
        {"contaminated": False, "queries": hot, "sf": calm["sf"]}, calm
    ) == (False, None)
    quarantined, reason = guard.classify_archive(
        {"contaminated": True, "box_drift_estimate": 2.1, "queries": dict(refs)},
        calm,
    )
    assert quarantined and "self-described" in reason


def test_guard_drift_estimate():
    guard = _bench_guard()
    calm = {"sf": 0.1, "refs": {"a": 1.0, "b": 2.0, "c": 4.0}}
    assert guard.drift_estimate({"a": 1.5, "b": 3.0, "c": 6.0}, calm) == 1.5
    # missing/failed (-1) refs drop out instead of poisoning the median
    assert guard.drift_estimate({"a": 2.0, "b": -1.0}, calm) == 2.0
    # no overlap => unknown (None), never "calm"
    assert guard.drift_estimate({"z": 1.0}, calm) is None
    assert guard.drift_estimate({}, {}) is None
    # different-SF legacy archives carry no comparable evidence
    assert guard.classify_archive(
        {"sf": 0.01, "queries": {"a": 99.0}}, calm
    ) == (False, None)


def test_guard_null_marker_falls_through_to_legacy():
    """contaminated=null means 'probes not applicable', not 'clean': the
    legacy retro-heuristics must still classify such an archive from the
    evidence it carries (ADVICE r10)."""
    guard = _bench_guard()
    calm = guard.load_calm_refs(ROOT)
    hot = {name: t * 3 for name, t in calm["refs"].items()}
    quarantined, reason = guard.classify_archive(
        {"contaminated": None, "queries": hot, "sf": calm["sf"]}, calm
    )
    assert quarantined and "legacy" in reason


def test_guard_cpus_gate():
    """VERDICT r12 item 9: the driver's 8-core scaling run falsely
    self-described contaminated (the synth probe's calm_sec is a 32-core
    calibration). Probes must not apply at a non-calibration core count,
    and such archives must stay out of the 32-core round-over-round diff."""
    guard = _bench_guard()
    calm = guard.load_calm_refs(ROOT)
    assert calm.get("cpus") == 32, "CALM_REFS must record its calibration cores"
    # probes apply only at the calibration core count
    assert guard.cpus_match(calm, "32") and guard.cpus_match(calm, 32)
    assert not guard.cpus_match(calm, "8")
    # a CALM_REFS without the field keeps the old behavior
    assert guard.cpus_match({"refs": {}}, "8")
    # an 8-core archive is quarantined from the diff with an honest reason,
    # regardless of how calm its queries look
    quarantined, reason = guard.classify_archive(
        {"cpus": 8, "contaminated": None, "queries": dict(calm["refs"]), "sf": calm["sf"]},
        calm,
    )
    assert quarantined and "cores" in reason
    # a 32-core archive is unaffected by the new field
    assert guard.classify_archive(
        {"cpus": 32, "contaminated": False, "queries": dict(calm["refs"]), "sf": calm["sf"]},
        calm,
    ) == (False, None)


def test_guard_adjudicate_disambiguates_code_from_box():
    """ADVICE r10 item 1: contamination evidence + a calm box verdict must
    NOT self-mark (the slowdown lives in the code; the gate should diff
    it), while a contended verdict corroborates quarantine."""
    guard = _bench_guard()
    # no evidence at all
    assert guard.adjudicate(1.1, True, False) == (False, False)
    # ref drift + contended box: genuine contamination
    assert guard.adjudicate(2.4, False, False) == (True, False)
    # ref drift + CALM box: the code got slower — never self-mask
    assert guard.adjudicate(2.4, True, False) == (False, True)
    # truncation evidence follows the same disambiguation
    assert guard.adjudicate(None, False, True) == (True, False)
    assert guard.adjudicate(None, True, True) == (False, True)
    # no box verdict: trust the evidence as before
    assert guard.adjudicate(2.4, None, False) == (True, False)
    assert guard.adjudicate(None, None, True) == (True, False)


def test_guard_box_calm_requires_both_probes():
    """r11 measured a page-cache-reclaim window with scan-heavy queries at
    3-15x while the CPU probe read 1.13x: a single calm probe must never
    clear the box."""
    guard = _bench_guard()
    assert guard.box_calm_verdict(1.1, 1.2) is True
    assert guard.box_calm_verdict(1.13, 3.4) is False  # the r11 IO window
    assert guard.box_calm_verdict(2.2, 1.1) is False
    assert guard.box_calm_verdict(None, 1.0) is None  # unknown, not calm
    assert guard.box_calm_verdict(1.0, None) is None
    # bounds differ per mode: scan swings wider when calm
    assert guard.box_calm_verdict(1.4, 1.9) is True

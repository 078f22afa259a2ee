"""Bench contamination guard (VERDICT r09 item 1).

This Firecracker guest suffers host/steal contention windows that slow
the whole box 2.2-2.8x for minutes at a time (measured via otherwise-idle
reference-query re-runs, README bench note).  A bench run recorded inside
such a window is a contaminated *measurement*, not a code regression —
round 9's driver bench (391s vs calm 179-209s on identical code) is the
canonical example.  This module gives both bench.py and the regression
gate one shared vocabulary for detecting that:

* ``drift_estimate``      — median probe/calm ratio over the reference
                            queries (q1_pricing_summary,
                            join_star_broadcast, text_quality; calm
                            medians committed in
                            bench_history/CALM_REFS.json).
* ``classify_archive``    — quarantine decision for an archived run:
                            a run that SELF-describes contamination
                            (bench.py r10+ writes ``contaminated``/
                            ``box_drift_estimate``) is trusted verbatim;
                            legacy archives are retro-classified from the
                            evidence they already carry (in-run reference
                            medians + budget-truncation shape).

Thresholds, each grounded in committed archives:

* ``CONTAMINATED_DRIFT`` (1.6): matches the gate's confirm-window bound.
  Probe windows on a calm box measure 0.9-1.3x (single-shot noise over
  sub-second queries); documented contention is >=2.2x; 1.6 splits them.
* ``LEGACY_REF_DRIFT`` (1.35): archived *medians* of the refs understate
  transient contamination (the median discards the worst interleaved
  sample).  Committed evidence: calm archives sit at 1.0-1.24x of
  CALM_REFS, the contaminated 391s archive at 1.47x; 1.35 splits them.
* ``LEGACY_TRUNCATION`` (0.5): a median_of_3 run whose measured-time
  budget left >half the queries with a single sample spent its whole
  450s budget inside pass 1 — calm full passes take 180-220s, so that
  alone evidences a >2x slowdown *during* the run (the 391s archive:
  168/201 queries at n=1).
"""

from __future__ import annotations

import json
import os
import statistics

CONTAMINATED_DRIFT = 1.6
LEGACY_REF_DRIFT = 1.35
LEGACY_TRUNCATION = 0.5
#: CPU-probe contamination bound: the probe is a fixed spark.range
#: aggregate (pure engine CPU, repo-independent), median-of-3 per window.
#: Measured calm window-median swing at SYNTH_ROWS is <=1.16x over 7
#: consecutive windows on an idle box (r11 calibration); documented
#: contention windows are >=2.2x. 1.5 splits them with margin on both
#: sides; an erroneous "contended" reading errs toward quarantine (the
#: pre-r11 behavior), never toward masking a code regression.
SYNTH_CALM_BOUND = 1.5
#: rows for the CPU probe — ~0.6s calm on local[32] (r11 measured
#: window medians 0.579-0.703s); long enough that scheduler noise
#: averages out, cheap enough for 3 runs per window (~6s per bench run)
SYNTH_ROWS = 1_600_000_000
#: IO-probe bound: the warm-path parquet scan's window medians swing up
#: to ~1.45x even on a mildly-perturbed box (r11 calibration: 0.379-0.723
#: over 7 windows), while a live page-cache-reclaim window slows scan
#: -heavy work 3-15x. 2.0 sits above the calm swing with real signal far
#: beyond it.
SCAN_CALM_BOUND = 2.0


def synthetic_probe_seconds(spark, rows: int = SYNTH_ROWS) -> float:
    """One timed run of the repo-independent CPU probe: a fixed
    ``spark.range`` aggregate using only engine builtins, so its cost
    tracks host CPU availability and NEVER repo code. This is what lets
    the contamination verdict distinguish 'the box is slow' from 'a code
    change made the suite slow' (a code change cannot move this number)."""
    import time

    t0 = time.perf_counter()
    spark.range(rows).selectExpr(
        "sum(id % 97) AS s", "count(if(id % 1000 = 0, 1, NULL)) AS n"
    ).collect()
    return time.perf_counter() - t0


def scan_probe_seconds(spark, path: str) -> float:
    """One timed run of the repo-independent IO probe: a fixed parquet
    aggregate over the benchmark's own testdata via ``spark.read`` —
    engine built-ins only, no repo code. Catches the contention mode the
    CPU probe is blind to: host page-cache reclaim / IO steal, where scan
    -heavy suite queries slow 2-15x while pure-CPU work stays calm (r11
    measured exactly this: refs 3.3x, range probe 1.13x, and an
    identical-code re-run minutes later back at 1.1-1.4x). Two scans,
    second timed: the first warms whatever cache the host will allow, so
    a calm box measures warm-path decode while live reclaim keeps the
    second scan slow too."""
    import time

    def scan():
        spark.read.parquet(path).selectExpr(
            "count(*) AS n", "sum(crc32(cast(l_orderkey AS string))) AS s"
        ).collect()

    scan()
    t0 = time.perf_counter()
    scan()
    return time.perf_counter() - t0


def box_calm_verdict(cpu_drift: float | None, scan_drift: float | None) -> bool | None:
    """True = both repo-independent probes read calm; False = either reads
    contended; None = unknown (a probe missing). Declaring the box calm
    requires BOTH the CPU probe (host steal) and the IO probe (page-cache
    reclaim) — r11 measured a window where scan-heavy queries ran 3-15x
    slow while the CPU probe read 1.13x, so a single-mode probe cannot
    clear the box."""
    if cpu_drift is None or scan_drift is None:
        return None
    if cpu_drift > SYNTH_CALM_BOUND or scan_drift > SCAN_CALM_BOUND:
        return False
    return True


def adjudicate(
    box_drift: float | None, box_calm: bool | None, truncated_heavy: bool
) -> tuple[bool, bool]:
    """(contaminated, code_drift_suspected) for a finishing bench run.

    Contamination *evidence* is reference-query drift over
    ``CONTAMINATED_DRIFT`` or a budget truncated inside pass 1. But the
    reference queries are part of the suite under test, so a real code
    slowdown produces the same evidence — and self-marking it contaminated
    would quarantine every future archive and mask the regression forever
    (ADVICE r10 item 1). The repo-independent probes disambiguate: when
    ``box_calm`` is True (CPU AND IO probes both calm, see
    :func:`box_calm_verdict`), the slowdown must live in the code — the
    run is NOT marked contaminated, so the gate diffs it and confirms the
    regression honestly. With no verdict (probes missing) the evidence is
    trusted as before."""
    evidence = (
        box_drift is not None and box_drift > CONTAMINATED_DRIFT
    ) or truncated_heavy
    if not evidence:
        return False, False
    if box_calm is True:
        return False, True
    return True, False


def cpus_match(calm_refs: dict, cpus) -> bool:
    """True when a run at ``cpus`` cores is comparable to CALM_REFS.

    The calm medians and both probe calibrations were taken on local[32];
    a run at a different core count is legitimately slower/faster on every
    query AND on the repo-independent probes (the synthetic probe scales
    ~linearly with cores), so drift ratios computed against the 32-core
    numbers are meaningless — the driver's 8-core scaling run was falsely
    self-describing contaminated at synth drift ~2.1 (VERDICT r12 item 9).
    A CALM_REFS file without a ``cpus`` field keeps the old behavior
    (probes apply at any core count)."""
    ref_cpus = calm_refs.get("cpus")
    return ref_cpus is None or str(ref_cpus) == str(cpus)


def load_calm_refs(root: str) -> dict:
    """Load bench_history/CALM_REFS.json; {} if absent/unreadable."""
    try:
        with open(os.path.join(root, "bench_history", "CALM_REFS.json")) as f:
            data = json.load(f)
        return data if isinstance(data.get("refs"), dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def drift_estimate(timings: dict, calm_refs: dict) -> float | None:
    """Median timing/calm ratio over the reference queries.

    ``timings`` maps query name -> seconds (probe single-shots or archived
    medians).  Returns None when no reference overlaps (different SF,
    subset run, missing calm file) — callers must treat None as
    'unknown', never as 'calm'.
    """
    refs = calm_refs.get("refs", {})
    ratios = [
        timings[name] / calm
        for name, calm in refs.items()
        if calm and calm > 0 and timings.get(name, -1.0) is not None
        and timings.get(name, -1.0) > 0
    ]
    return round(statistics.median(ratios), 3) if ratios else None


def classify_archive(archive: dict, calm_refs: dict) -> tuple[bool, str | None]:
    """(quarantined, reason) for an archived full-suite bench run.

    Self-described runs (bench.py r10+) are trusted verbatim; legacy
    archives are retro-classified from their in-run reference medians and
    budget-truncation shape (thresholds documented in the module
    docstring).  An archive at a different SF than CALM_REFS carries no
    comparable evidence and is kept (the gate only ever diffs same-SF
    archives).
    """
    arch_cpus = archive.get("cpus")
    if arch_cpus is not None and not cpus_match(calm_refs, arch_cpus):
        # a run at a non-calibration core count (the driver's scaling leg)
        # is not comparable to same-SF 32-core archives: diffing it would
        # flag every query, and its probe evidence is core-count-inflated
        return True, (
            f"recorded at {arch_cpus} cores; CALM_REFS calibrated at "
            f"{calm_refs.get('cpus')} — not comparable to same-SF archives"
        )

    marker = archive.get("contaminated")
    if isinstance(marker, bool):  # null means "probes not applicable", not
        # "clean" — such an archive still carries legacy evidence, so only
        # a real boolean self-description short-circuits (ADVICE r10)
        if marker:
            return True, (
                "self-described contaminated "
                f"(box_drift_estimate {archive.get('box_drift_estimate')})"
            )
        return False, None

    sf = calm_refs.get("sf")
    if sf is not None and archive.get("sf") not in (sf, str(sf)):
        return False, None

    drift = drift_estimate(archive.get("queries", {}), calm_refs)
    if drift is not None and drift > LEGACY_REF_DRIFT:
        return True, (
            f"legacy archive: reference-median drift {drift}x > "
            f"{LEGACY_REF_DRIFT}x vs CALM_REFS"
        )

    n_samples = archive.get("n_samples", {})
    estimator = str(archive.get("estimator", ""))
    if n_samples and estimator.startswith("median_of_") and estimator != "median_of_1":
        single = sum(1 for n in n_samples.values() if n == 1)
        if single > LEGACY_TRUNCATION * len(n_samples):
            return True, (
                f"legacy archive: budget truncated {single}/{len(n_samples)} "
                "queries to a single sample — the whole measured-time budget "
                "went inside pass 1, evidencing an in-run slowdown"
            )
    return False, None

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
    if "contaminated" in archive:
        if archive["contaminated"]:
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

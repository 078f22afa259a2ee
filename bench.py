"""Benchmark: run the engine's query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    from graphique_spark.session import DEFAULT_CONF

    builder = (
        SparkSession.builder.appName("graphique-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        # keep stdout clean: the \r-based progress bar can glue onto the
        # final JSON line and corrupt downstream parsing
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in DEFAULT_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    all_queries = queries  # warmup must cover every family even in subset mode
    # SPARK_GRAFT_BENCH_ONLY=name1,name2 runs a subset (local iteration and
    # the regression gate's fresh-confirm step). Subset runs never write
    # BENCH_local.json or bench_history/ — they aren't suite runs.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        queries = {n: fn for n, fn in queries.items() if n in wanted}
        missing = wanted - set(queries)
        if missing:
            print(f"bench: unknown queries ignored: {sorted(missing)}", file=sys.stderr)
    # JVM/codegen/python-worker warmup at sf0.001 (not counted): one query
    # per operator family, so whichever query runs first isn't charged the
    # whole-stage-codegen compile, broadcast machinery, shuffle service and
    # pandas-worker spin-up costs. Registration order rotates per round
    # (least-recently-verified first), so timings must be order-invariant.
    warm_dir = "/root/testdata/sf0.001"
    for warm in [
        "top_k_global", "q1_pricing_summary", "join_star_broadcast",
        "dedup_minhash", "dedup_components", "similarity_ivf",
        "text_repetition", "multimodal_decode", "stream_tumbling_window",
        "runs_adjacency", "pagerank_suppliers", "retrieval_bm25",
        "asof_join_events", "image_dhash_dedup", "similarity_ivf_trained",
        "lm_bigram_perplexity",
    ]:
        try:
            fn = all_queries.get(warm)
            if fn is not None:
                fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:  # noqa: BLE001  (warmup is best-effort)
            pass
    # large-shape warmup: at sf0.001 AQE broadcasts every join, so the
    # sort-merge/iteration codegen paths the bench SF actually takes are
    # first compiled inside a TIMED query. A synthetic range-generated
    # graph (no bench data touched) compiles them up front.
    try:
        from pyspark.sql import functions as F

        from graphique_spark.operators.graph import pagerank

        edges = spark.range(600_000).select(
            (F.col("id") % 16000).alias("src"),
            ((F.col("id") * 7) % 9999 + 1_000_000).alias("dst"),
        )
        pagerank(edges, iterations=3).write.mode("overwrite").format("noop").save()
    except Exception:  # noqa: BLE001
        pass
    spark.catalog.clearCache()

    # Median-of-N timing (default 3): a single-run suite total on this box
    # swings 173-262s on identical code (documented r04-r07), so one sample
    # per query cannot detect even a 30% real regression. Passes run
    # INTERLEAVED (q1..qN, then q1..qN again) so temporally-local box noise
    # (a GC storm, a background process) lands in at most one sample per
    # query instead of all of them; the per-query median then discards it.
    # SPARK_GRAFT_BENCH_BUDGET (seconds of MEASURED time, default 450)
    # truncates later passes gracefully — queries keep whatever samples
    # they have (median of fewer; pass 1 always covers every query). The
    # default keeps total wall near ~550s so an unattended driver run
    # can't hit a harness timeout; raise it for full 3-sample medians
    # (~700s wall at sf0.1).
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "450"))

    # Contamination self-description (VERDICT r09 item 1): this guest
    # suffers 2.2-2.8x host/steal contention windows, and a bench recorded
    # inside one (BENCH_r09: 391s vs 179-209s calm, identical code) reads
    # as a fake regression. Time the gate's three reference queries at run
    # start / after pass 1 / at run end against their committed calm
    # medians (bench_history/CALM_REFS.json) and report the worst window's
    # drift plus a contaminated marker, so the emitted JSON adjudicates
    # itself and the gate can quarantine the archive.
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "bench_guard", os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_guard.py")
    )
    _guard = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_guard)
    calm_refs = _guard.load_calm_refs(os.path.dirname(os.path.abspath(__file__)))
    # subset (SPARK_GRAFT_BENCH_ONLY) runs skip probes: they are the
    # gate's fresh-confirm vehicle, which appends the reference queries
    # itself and computes its own drift from them. Runs at a core count
    # other than CALM_REFS' calibration (the driver's scaling leg) skip
    # them too: every calm median and probe calibration is 32-core, so an
    # 8-core run read as ~2x "drift" and falsely self-described
    # contaminated (VERDICT r12 item 9) — contaminated stays null
    # ("probes not applicable") for such runs.
    probes_apply = (
        bool(calm_refs)
        and str(calm_refs.get("sf")) == str(sf)
        and not only
        and _guard.cpus_match(calm_refs, cpus)
    )
    ref_probes: dict[str, dict[str, float]] = {}
    # repo-independent box probe (ADVICE r10 item 1): a fixed spark.range
    # aggregate whose cost tracks the HOST, never repo code — it
    # disambiguates "box contended" (quarantine) from "code got slower"
    # (do NOT self-mask; let the gate confirm the regression)
    synth_calm = calm_refs.get("synthetic") or {}
    synth_probes: dict[str, float] = {}
    scan_probes: dict[str, float] = {}

    def _probe(window: str) -> None:
        # single-shot timings (probe cost ~1.5s/window); the per-window
        # median over 3 refs dampens single-sample noise, and the 1.6x
        # contamination bound sits well above calm single-shot swing
        if not probes_apply:
            return
        timings: dict[str, float] = {}
        for ref in calm_refs.get("refs", {}):
            fn = all_queries.get(ref)
            if fn is None:
                continue
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                timings[ref] = round(time.perf_counter() - t0, 3)
            except Exception:  # noqa: BLE001  (probes are best-effort)
                pass
            spark.catalog.clearCache()
        if timings:
            ref_probes[window] = timings
        if synth_calm.get("calm_sec"):
            try:
                runs = sorted(
                    _guard.synthetic_probe_seconds(
                        spark, int(synth_calm.get("rows", _guard.SYNTH_ROWS))
                    )
                    for _ in range(3)
                )
                synth_probes[window] = round(runs[1], 3)  # median of 3
            except Exception:  # noqa: BLE001
                pass
        if synth_calm.get("scan_calm_sec"):
            try:
                path = os.path.join(sf_dir, synth_calm.get("scan_file", "lineitem.parquet"))
                runs = sorted(
                    _guard.scan_probe_seconds(spark, path) for _ in range(3)
                )
                scan_probes[window] = round(runs[1], 3)
            except Exception:  # noqa: BLE001
                pass

    _probe("start")
    samples: dict[str, list[float]] = {name: [] for name in queries}
    failed: set[str] = set()
    measured = 0.0
    for rep in range(repeats):
        if rep == 1:
            _probe("mid")
        for name, fn in queries.items():
            if name in failed:
                continue
            if rep > 0 and measured > budget:
                break
            start = time.perf_counter()
            try:
                # noop sink: materializes every column/row, no count() shortcuts
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            except Exception as exc:  # noqa: BLE001
                print(f"bench error in {name}: {exc}", file=sys.stderr)
                failed.add(name)
                continue
            elapsed = time.perf_counter() - start
            measured += elapsed
            samples[name].append(round(elapsed, 3))
            # queries are self-contained: drop persisted blocks (two-phase
            # operators pin partition snapshots) so cache pressure from one
            # query can't distort later timings
            spark.catalog.clearCache()

    _probe("end")

    timings: dict[str, float] = {}
    for name, vals in samples.items():
        if name in failed or not vals:
            timings[name] = -1.0
            continue
        vals = sorted(vals)
        mid = len(vals) // 2
        median = vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2
        timings[name] = round(median, 3)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # worst-window drift: contamination anywhere in the run invalidates
    # whatever tail of the timings it overlapped, so the max (not the
    # mean) of the per-window medians is the honest estimate
    window_drifts = {
        w: _guard.drift_estimate(t, calm_refs) for w, t in ref_probes.items()
    }
    window_drifts = {w: d for w, d in window_drifts.items() if d is not None}
    box_drift = max(window_drifts.values()) if window_drifts else None
    single = sum(1 for v in samples.values() if len(v) == 1)
    truncated_heavy = (
        repeats >= 3 and len(samples) > 0 and single > 0.5 * len(samples)
    )
    # worst-window repo-independent drifts (None when CALM_REFS has no
    # calibrated entry or every probe failed)
    synth_drift = None
    if synth_probes and synth_calm.get("calm_sec"):
        synth_drift = round(
            max(synth_probes.values()) / float(synth_calm["calm_sec"]), 3
        )
    scan_drift = None
    if scan_probes and synth_calm.get("scan_calm_sec"):
        scan_drift = round(
            max(scan_probes.values()) / float(synth_calm["scan_calm_sec"]), 3
        )
    contaminated = None
    code_drift_suspected = False
    if probes_apply and not only:
        # budget exhausted inside pass 1 counts as evidence: calm full
        # passes take 180-220s against the 450s budget, so truncation
        # alone evidences a >2x in-run slowdown; adjudicate() then asks
        # the probes WHOSE slowdown it was (box vs code) — declaring the
        # box calm requires BOTH the CPU and IO probes (r11: a page-cache
        # reclaim window slowed scans 3-15x at CPU drift 1.13)
        contaminated, code_drift_suspected = _guard.adjudicate(
            box_drift, _guard.box_calm_verdict(synth_drift, scan_drift), truncated_heavy
        )
    full = {
        "metric": "suite_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # core count of this run (master local[cpus]): lets the bench gate
        # keep non-calibration-core archives (the driver's scaling legs)
        # out of the 32-core round-over-round diff
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
        # methodology marker (round 8+): value = SUM OF PER-QUERY MEDIANS
        # over `repeats` interleaved passes, not single-run wall — r07 and
        # earlier BENCH files are single-run and not directly comparable
        "estimator": f"median_of_{repeats}",
        # actual per-query sample counts: the measured-time budget truncates
        # later passes, so tail queries can have fewer samples than the
        # estimator label suggests; bench_diff warns on unequal counts
        "n_samples": {name: len(vals) for name, vals in samples.items()},
        "samples": samples,
        # contamination self-description (r10+): single-shot reference-query
        # probes at run start/mid/end vs bench_history/CALM_REFS.json.
        # contaminated=true means THIS MEASUREMENT was taken inside a host
        # contention window (or blew its sample budget inside pass 1) and
        # must not be read as a code regression; the bench gate quarantines
        # such archives. null = probes not applicable (subset run, non-calm
        # SF, missing CALM_REFS).
        "ref_probes": ref_probes,
        "box_drift_estimate": box_drift,
        # repo-independent probes (median-of-3 per window, worst window vs
        # CALM_REFS "synthetic"): spark.range CPU probe + parquet scan IO
        # probe. Both calm on a slow run means the CODE got slower
        # (code_drift_suspected=true, contaminated stays false so the gate
        # diffs the archive and confirms the regression); either contended
        # corroborates quarantine.
        "synthetic_probes": synth_probes or None,
        "synthetic_drift_estimate": synth_drift,
        "scan_probes": scan_probes or None,
        "scan_drift_estimate": scan_drift,
        "code_drift_suspected": code_drift_suspected,
        "contaminated": contaminated,
    }
    # The driver records only a 2000-char tail of stdout and JSON-parses it;
    # the full per-query map at 180+ queries is ~6 KB, so a single big line
    # starts mid-window and parses as null (BENCH_r04/r05). Keep stdout to
    # ONE line guaranteed under the window: totals + the slowest queries,
    # trimmed until the line fits. The complete map goes to stderr and to
    # BENCH_local.json next to this script.
    here = os.path.dirname(os.path.abspath(__file__))
    if not only:
        try:
            with open(os.path.join(here, "BENCH_local.json"), "w") as f:
                json.dump(full, f)
        except OSError:
            pass
    # Round-over-round regression wiring: archive every FULL run (all
    # registered queries, the default sf) under bench_history/ so
    # tests/test_bench_gate.py can diff the two most recent runs with
    # tools/bench_diff.py and red the suite on confirmed >1.4x drift.
    # Partial/debug runs (query subsets, other SFs) are not archived.
    # debug overrides (fewer repeats / a tighter budget than the defaults)
    # don't qualify either: a single-sample run carries 3.4x per-query noise
    # and would poison the gate as a first-class input
    if (
        not only
        and not failed
        and all(t >= 0 for t in timings.values())
        and repeats >= 3
        and budget >= 450
    ):
        try:
            hist = os.path.join(here, "bench_history")
            os.makedirs(hist, exist_ok=True)
            with open(
                os.path.join(hist, f"bench_{int(time.time())}_sf{sf}.json"), "w"
            ) as f:
                json.dump(full, f)
        except OSError:
            pass
    print(json.dumps(full), file=sys.stderr, flush=True)

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    keep = len(slowest)
    line = json.dumps(
        {
            "metric": "suite_total_wall",
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "n_queries": len(timings),
            "estimator": f"median_of_{repeats}",
            "box_drift_estimate": box_drift,
            "synthetic_drift_estimate": synth_drift,
            "scan_drift_estimate": scan_drift,
            "code_drift_suspected": code_drift_suspected,
            "contaminated": contaminated,
            "queries": {},
        }
    )
    while keep > 0:
        kept = dict(list(slowest.items())[:keep])
        compact = {
            "metric": "suite_total_wall",
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "n_queries": len(timings),
            "estimator": f"median_of_{repeats}",
            "box_drift_estimate": box_drift,
            "synthetic_drift_estimate": synth_drift,
            "scan_drift_estimate": scan_drift,
            "code_drift_suspected": code_drift_suspected,
            "contaminated": contaminated,
            "n_samples": {name: len(samples[name]) for name in kept},
            "queries": kept,
        }
        candidate = json.dumps(compact)
        if len(candidate) <= 1800:
            line = candidate
            break
        # only adopt candidates that fit (`line` keeps the empty-queries
        # fallback otherwise) and step all the way down through 1
        keep = min(keep - 1, int(keep * 0.8))
    print(line, flush=True)


if __name__ == "__main__":
    main()

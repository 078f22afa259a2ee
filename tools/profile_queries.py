"""Per-query profiler for the optimization rounds: for each named suite
query, measure (a) DataFrame build time (driver-side plan construction +
any plan-time jobs like centroid collects), (b) noop-sink execution wall,
(c) the number of Spark jobs and stages the query submitted, and (d) the
``explain("formatted")`` physical plan — the evidence base the
spark_optimization_guide §1 asks for before touching anything.

Usage:
    PYTHONPATH=/root/repo python tools/profile_queries.py [--plans DIR]
        [--sf SF_DIR] [--repeats N] name [name ...]

Writes one JSON line per query to stdout and (with --plans) the formatted
plan to DIR/<name>.txt. Job/stage counts come from the status tracker via
per-query job groups, so plan-time jobs (collects inside the query
builder) are included.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--top", type=int, default=0, help="profile the N slowest from BENCH_local.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from graphique_spark.session import DEFAULT_CONF

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("graphique-spark-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in DEFAULT_CONF.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    names = list(args.names)
    if args.top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "BENCH_local.json")) as f:
            bench = json.load(f)
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    sc = spark.sparkContext
    # warmup: every profiled query once at sf0.001 so codegen/broadcast
    # machinery is hot before anything is timed
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception:  # noqa: BLE001
            pass
    spark.catalog.clearCache()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in names:
        fn = queries[name]
        best = None
        for rep in range(max(1, args.repeats)):
            group = f"{name}#{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            tracker = sc.statusTracker()
            jobs = tracker.getJobIdsForGroup(group)
            stages = 0
            tasks = 0
            for j in jobs:
                info = tracker.getJobInfo(j)
                if info is None:
                    continue
                stages += len(info.stageIds)
                for s in info.stageIds:
                    sinfo = tracker.getStageInfo(s)
                    if sinfo is not None:
                        tasks += sinfo.numTasks
            rec = {
                "query": name,
                "build_s": round(t_build, 3),
                "wall_s": round(wall, 3),
                "jobs": len(jobs),
                "stages": stages,
                "tasks": tasks,
            }
            if best is None or rec["wall_s"] + rec["build_s"] < best["wall_s"] + best["build_s"]:
                best = rec
            if args.plans and rep == 0:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:  # noqa: BLE001
                    from contextlib import redirect_stdout
                    import io

                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                    f.write(plan)
            spark.catalog.clearCache()
        print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()

"""Mimic the driver's correctness gate: run every ``queries()[name]`` on
Spark and the matching ``oracle_sql()[name]`` on DuckDB at sf0.01, compare
row count, column names, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [--strict]
       [--conf-matrix] [name ...]

``--strict`` skips the 12-significant-digit float collapse and compares
``str(value)`` verbatim, like the driver's value hash does. This catches
type-representation drift (e.g. Spark ``floor``→BIGINT ``512345`` vs DuckDB
``floor``→DOUBLE ``512345.0``) that the tolerant mode deliberately hides.

``--conf-matrix`` (VERDICT r10 item 6) re-runs the whole comparison under
each perturbed session config in ``CONF_MATRIX`` after the default pass: a
query whose correctness silently depends on AQE coalescing, broadcast-join
planning, or the shuffle partition count passes the default-config gate but
diverges here. All three knobs are runtime SQL confs, so one session hosts
every pass (restored between passes).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
STRICT = False

#: config perturbations for --conf-matrix: each must leave RESULTS
#: unchanged on every oracle-paired query (plans may differ wildly)
CONF_MATRIX = {
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "force_smj": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    "shuffle_p7": {"spark.sql.shuffle.partitions": "7"},
    # codegen-off exercises the interpreted expression fallback paths
    "codegen_off": {"spark.sql.codegen.wholeStage": "false"},
    # ANSI mode turns silent-null arithmetic (div/0, overflow, bad casts)
    # into errors — any query relying on permissive NULLs diverges here
    "ansi_on": {"spark.sql.ansi.enabled": "true"},
}


def normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if STRICT:
            return repr(value)
        # collapse fp noise: 12 significant digits
        return f"{value:.12g}"
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(str(normalize(v)) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ",".join(f"{k}:{normalize(v)}" for k, v in sorted(value.items())) + "}"
    try:  # Decimal → trimmed string
        import decimal

        if isinstance(value, decimal.Decimal):
            return str(value) if STRICT else f"{float(value):.12g}"
    except ImportError:
        pass
    return value


def canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(str(normalize(row[i])) for i in order))
    return sorted(out)


def main():
    import __spark_entry__ as entry

    from graphique_spark.session import get_session

    # the engine's DEFAULT_CONF, same as bench/driver runs — a gate under
    # a different session config could pass what the benched config breaks
    spark = get_session(
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    args = [a for a in sys.argv[1:] if a not in ("--strict", "--conf-matrix")]
    chosen = None
    for arg in list(args):
        if arg.startswith("--configs="):  # e.g. --configs=codegen_off,ansi_on
            chosen = arg.split("=", 1)[1].split(",")
            args.remove(arg)
            unknown_cfg = [c for c in chosen if c not in CONF_MATRIX and c != "default"]
            if unknown_cfg:
                raise SystemExit(f"unknown config(s): {unknown_cfg} (see CONF_MATRIX)")
    unknown = [a for a in args if a not in queries]
    if unknown:
        raise SystemExit(f"unknown query name(s): {unknown} (see queries())")
    wanted = args or list(queries)

    if chosen is not None:
        configs = [(c, CONF_MATRIX.get(c, {})) for c in chosen]
    else:
        configs = [("default", {})]
        if "--conf-matrix" in sys.argv:
            configs += list(CONF_MATRIX.items())
    total_failed = 0
    for conf_name, conf in configs:
        saved = {key: spark.conf.get(key) for key in conf}
        for key, value in conf.items():
            spark.conf.set(key, value)
        if len(configs) > 1:
            print(f"\n=== config: {conf_name} {conf or ''} ===")
        total_failed += run_pass(spark, con, queries, oracles, wanted)
        for key, value in saved.items():
            spark.conf.set(key, value)
    return 1 if total_failed else 0


def run_pass(spark, con, queries, oracles, wanted) -> int:
    passed = failed = weak = 0
    for name in wanted:
        fn = queries[name]
        start = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(srows)} (no oracle)")
            weak += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            failed += 1
            continue
        elapsed = time.time() - start
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
            failed += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            failed += 1
            continue
        s_canon, o_canon = canon(srows, scols), canon(orows, ocols)
        if s_canon != o_canon:
            diffs = [
                (a, b) for a, b in zip(s_canon, o_canon) if a != b
            ][:3]
            print(f"FAIL {name}: values differ; first diffs (spark vs oracle):")
            for a, b in diffs:
                print(f"   spark : {a}")
                print(f"   oracle: {b}")
            failed += 1
            continue
        print(f"PASS {name}: {len(srows)} rows [{elapsed:.1f}s]")
        passed += 1
    print(f"\n{passed} passed, {failed} failed, {weak} weak (rows-only)")
    return failed


if __name__ == "__main__":
    if "--strict" in sys.argv:
        STRICT = True
    raise SystemExit(main())

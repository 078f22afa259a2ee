"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing summary)
at sf0.001. ``queries()``/``oracle_sql()`` expose the engine's full query
suite (graphique_spark.suite) for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphique_spark import suite
from graphique_spark import suite_llm  # noqa: F401  (registers into suite.QUERIES)
from graphique_spark import suite_partsupp  # noqa: F401  (merges only if partsupp.parquet exists)
from graphique_spark import suite_streaming  # noqa: F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """Map query name -> most recent round with a green driver row.

    The driver's correctness gate samples the FIRST 50 registered queries;
    with 72 queries, a fixed order would leave a stable tail never
    re-verified. Reading the committed CORRECTNESS_r*.json files lets
    ``queries()`` order least-recently-verified first, so every query
    rotates through the gate within two rounds.
    """
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        match = re.search(r"r(\d+)", os.path.basename(path))
        if not match:
            continue
        rnd = int(match.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            # A row only counts as verified if it was fully green: a
            # hash_match=False row (e.g. the r04 floor-repr bug) must sort
            # as never-verified so the fixed query re-enters the next
            # round's 50-query gate window immediately.
            if (
                isinstance(row, dict)
                and not row.get("err")
                and row.get("rows_match")
                and row.get("hash_match") is not False
                and row.get("schema_match") is not False
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    least-recently-driver-verified first (see ``_last_verified_round``)."""
    last = _last_verified_round()
    names = sorted(suite.QUERIES, key=lambda name: last.get(name, -1))
    return {name: suite.QUERIES[name] for name in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same aliases)."""
    return dict(suite.ORACLES)

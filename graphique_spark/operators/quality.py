"""Data-quality constraint checking (the Deequ / Great Expectations shape):
declare rules against a table, get back one violations row per rule.

Scale shape: every row-local rule (nullness, range, regexp, set
membership, custom predicate) folds into ONE conditional-count aggregate —
a single scan, map-side combined, one row out per rule. Only the two
genuinely relational rules cost more, and each is a single extra
aggregate/join:

* ``unique`` — one groupBy over the key columns counting groups with >1
  row (the shuffle carries only the key).
* ``foreign_key`` — a left-anti join against the (deduplicated) referenced
  keys; AQE broadcasts the reference side when it fits.

Use it as the pipeline gate between ingest and curation: assert
``violations == 0`` per rule, or route the report to the run log.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One declarative expectation. ``kind``:

    * ``not_null`` — ``column`` has no nulls
    * ``in_range`` — ``lo <= column <= hi`` (nulls violate; pair with
      not_null or widen the predicate instead of hiding them)
    * ``matches`` — ``column`` fully matches regexp ``pattern``
    * ``isin`` — ``column`` value in ``values``
    * ``predicate`` — arbitrary boolean ``Column`` in ``expr`` holds
    * ``unique`` — ``columns`` form a key (violations = surplus rows)
    * ``foreign_key`` — every ``column`` value exists in ``ref[ref_column]``
    """

    name: str
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: Sequence | None = None
    expr: Column | None = None
    columns: Sequence[str] | None = None
    ref: DataFrame | None = None
    ref_column: str | None = None


def _violation_expr(rule: Rule) -> Column:
    col = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return col.isNull()
    if rule.kind == "in_range":
        return ~col.between(rule.lo, rule.hi) | col.isNull()
    if rule.kind == "matches":
        return ~col.rlike(f"^(?:{rule.pattern})$") | col.isNull()
    if rule.kind == "isin":
        return ~col.isin(list(rule.values)) | col.isNull()
    if rule.kind == "predicate":
        return ~F.coalesce(rule.expr, F.lit(False))
    raise ValueError(f"unknown row-local rule kind {rule.kind!r}")


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns
    (rule, kind, violations, checked, passed) — one row per rule, ordered
    as given. Row-local rules share a single scan."""
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame(
            [],
            "rule string, kind string, violations bigint, "
            "checked bigint, passed boolean",
        )
    local = [r for r in rules if r.kind not in ("unique", "foreign_key")]
    reports: list[DataFrame] = []
    if local:
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(_violation_expr(r).cast("long")).alias(f"__v{i}")
                for i, r in enumerate(local)
            ],
        )
        for i, r in enumerate(local):
            reports.append(
                agg.select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("violations"),
                    F.col("__n").alias("checked"),
                )
            )
    for r in rules:
        if r.kind == "unique":
            keys = list(r.columns)
            grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
            reports.append(
                grouped.agg(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.coalesce(
                        F.sum(F.when(F.col("__c") > 1, F.col("__c") - 1)), F.lit(0)
                    ).alias("violations"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("checked"),
                )
            )
        elif r.kind == "foreign_key":
            refs = r.ref.select(F.col(r.ref_column).alias(r.column)).distinct()
            # reuse the row-local rules' shared count instead of a third
            # full scan when it exists (same value by definition)
            if local:
                n_all = agg.select(F.col("__n").alias("checked"))
            else:
                n_all = df.agg(
                    F.count(F.lit(1)).alias("checked"),
                )
            orphans = (
                df.select(r.column)
                .join(refs, on=r.column, how="left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            reports.append(
                orphans.crossJoin(n_all).select(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    "violations",
                    "checked",
                )
            )
    order = {r.name: i for i, r in enumerate(rules)}
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    mapping = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    return (
        out.withColumn("__o", mapping[F.col("rule")])
        .orderBy("__o")
        .drop("__o")
        .withColumn("passed", F.col("violations") == 0)
    )

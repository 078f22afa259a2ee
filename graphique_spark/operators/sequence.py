"""Order-sensitive operators without single-partition bottlenecks.

Spark DataFrames are unordered; the reference relies on a stable natural row
order for ``slice``/``take``/``runs`` (reference interface.py:177-183,
424-435, 464-489). The naive Spark translation — a window over a global
``ORDER BY`` with no partition key — serializes the whole table through one
task. Every helper here instead uses the classic two-phase pattern:

1. partition-local computation (window partitioned by ``spark_partition_id``),
2. a tiny per-partition summary collected to the driver (#partitions rows),
   turned into offsets and broadcast back.

Cost: one narrow pass + one broadcast join — no global sort, no single task.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gs_pid"
_MONO = "__gs_mono"


def _ordering(order_by: Sequence[str | Column]) -> list[Column]:
    cols = []
    for key in order_by:
        if isinstance(key, str):
            cols.append(F.col(key[1:]).desc() if key.startswith("-") else F.col(key))
        else:
            cols.append(key)
    return cols


def with_row_index(df: DataFrame, name: str = "_rowid") -> DataFrame:
    """Add a dense 0-based row index in current (scan) row order.

    ``monotonically_increasing_id`` is already ordered *within* a partition;
    a per-partition ``row_number`` plus driver-computed partition offsets
    yields a dense global index without any global sort. This is
    ``zipWithIndex`` re-expressed in DataFrame operators (Arrow-friendly,
    no RDD serialization).
    """
    tagged = df.withColumn(_PID, F.spark_partition_id()).withColumn(
        _MONO, F.monotonically_increasing_id()
    )
    counts = {
        row[_PID]: row["cnt"]
        for row in tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, total = {}, 0
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col(_PID)
    ) if offsets else F.lit(0)
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(_MONO)) - 1
    return (
        tagged.withColumn(name, (local + offset_expr).cast("long"))
        .drop(_PID, _MONO)
    )


def partitioned_cumsum(
    df: DataFrame, value: Column, order_by: Sequence[str | Column], name: str
) -> DataFrame:
    """Global cumulative sum of ``value`` in ``order_by`` order, two-phase.

    Range-repartition on the sort keys (so partition i holds keys < partition
    i+1), cumsum within each partition, then add the collected per-partition
    totals of all earlier partitions.
    """
    order = _ordering(order_by)
    parts = df.repartitionByRange(*order).sortWithinPartitions(*order)
    parts = parts.withColumn(_PID, F.spark_partition_id()).withColumn("__gs_val", value)
    totals = {
        row[_PID]: row["total"]
        for row in parts.groupBy(_PID).agg(F.sum("__gs_val").alias("total")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid] or 0
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col(_PID)
    ) if offsets else F.lit(0)
    w = Window.partitionBy(_PID).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return parts.withColumn(name, F.sum("__gs_val").over(w) + offset_expr).drop(
        _PID, "__gs_val"
    )


def with_run_ids(
    df: DataFrame,
    by: Sequence[str],
    order_by: Sequence[str | Column],
    split: Column | None = None,
    name: str = "_run",
) -> DataFrame:
    """Assign a dense run id: consecutive rows (in ``order_by`` order) with
    equal ``by`` values share a run (reference ``runs``, interface.py:464-489:
    ``(c != lag(c)).fill_null(False) → or_ → cumsum → group``).

    Two-phase like :func:`partitioned_cumsum`: change-points are detected with
    a partition-local ``lag``; the cross-partition boundary rows (one per
    partition) are collected to the driver to decide whether each partition's
    first row starts a new run, and run-counts per partition become offsets.
    """
    order = _ordering(order_by)
    parts = df.repartitionByRange(*order).sortWithinPartitions(*order)
    parts = parts.withColumn(_PID, F.spark_partition_id())
    w = Window.partitionBy(_PID).orderBy(*order)

    change: Column = F.lit(False)
    for col in by:
        lagged = F.lag(F.col(col)).over(w)
        # null-safe inequality; first-in-partition (lag null) handled below
        change = change | ~F.col(col).eqNullSafe(lagged)
    if split is not None:
        change = change | F.coalesce(split, F.lit(False))
    parts = parts.withColumn("__gs_rn", F.row_number().over(w))
    first_in_part = F.col("__gs_rn") == 1

    # Boundary fixup: last row of each partition, collected (tiny).
    lasts = {
        row[_PID]: row["vals"]
        for row in parts.groupBy(_PID)
        .agg(F.max_by(F.struct(*[F.col(c) for c in by]), F.col("__gs_rn")).alias("vals"))
        .collect()
    }
    pids = sorted(lasts)
    boundary_change = {}  # pid -> does its first row start a new run?
    for i, pid in enumerate(pids):
        boundary_change[pid] = i > 0  # refined below against previous last row
    # Compare each partition's first row with the previous partition's last
    # row via a broadcast of the previous-last values.
    prev_rows = []
    for i, pid in enumerate(pids):
        if i == 0:
            continue
        prev = lasts[pids[i - 1]]
        prev_rows.append((pid, *[prev[c] for c in by]))
    spark = df.sparkSession
    if prev_rows:
        prev_df = spark.createDataFrame(
            prev_rows, schema=[_PID] + [f"__prev_{c}" for c in by]
        )
        parts = parts.join(F.broadcast(prev_df), on=_PID, how="left")
    else:
        for col in by:
            parts = parts.withColumn(f"__prev_{col}", F.lit(None))

    cross_change: Column = F.lit(False)
    for col in by:
        cross_change = cross_change | ~F.col(col).eqNullSafe(F.col(f"__prev_{col}"))
    if split is not None:
        cross_change = cross_change | F.coalesce(split, F.lit(False))
    # First row of the *first* partition begins run 0 — not a "change"; other
    # partitions' first rows compare against the previous partition's last row.
    change = F.when(
        first_in_part, cross_change & (F.col(_PID) > min(pids, default=0))
    ).otherwise(change)

    parts = parts.withColumn("__gs_chg", change.cast("long"))
    # run id = global cumsum of change flags: local cumsum + per-partition offsets
    totals = {
        row[_PID]: row["t"]
        for row in parts.groupBy(_PID).agg(F.sum("__gs_chg").alias("t")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid] or 0
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col(_PID)
    ) if offsets else F.lit(0)
    wc = Window.partitionBy(_PID).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    out = parts.withColumn(name, (F.sum("__gs_chg").over(wc) + offset_expr).cast("long"))
    return out.drop(_PID, "__gs_chg", "__gs_rn", *[f"__prev_{c}" for c in by])

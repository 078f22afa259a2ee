"""Numeric functions (reference ``Numeric``, inputs.py:377-420).

``bucket`` reproduces the reference's closed-edge options as a chained
``CASE WHEN`` (pure codegen, no UDF). Cumulative ``cumsum/cummean/cummax/
cummin`` are window forms — callers supply ordering; for global order use
:mod:`graphique_spark.operators.sequence` to avoid a single-partition window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

__all__ = [
    "abs_", "acos", "asin", "atan", "atan2", "bucket", "ceil", "cos",
    "cummax", "cummean", "cummin", "cumsum", "exp", "floor", "isinf",
    "isnan", "log", "negate", "round_", "sign", "sin", "sqrt", "tan",
]

abs_ = F.abs
acos, asin, atan, atan2 = F.acos, F.asin, F.atan, F.atan2
ceil, floor = F.ceil, F.floor
cos, sin, tan = F.cos, F.sin, F.tan
exp, sqrt = F.exp, F.sqrt
sign = F.signum
isnan = F.isnan


def negate(col: Column) -> Column:
    return -col


def isinf(col: Column) -> Column:
    return (col == F.lit(float("inf"))) | (col == F.lit(float("-inf")))


def log(col: Column, base: float | None = None) -> Column:
    return F.log(col) if base is None else F.log(float(base), col)


def round_(col: Column, digits: int = 0) -> Column:
    return F.round(col, digits)


def bucket(
    col: Column,
    buckets: Sequence[float],
    closed: str = "left",
    close_extreme: bool = True,
    include_under: bool = False,
    include_over: bool = False,
) -> Column:
    """Bucket index for ``col`` given sorted edges (reference
    inputs.py:393-404, delegating to ibis ``bucket``).

    ``closed='left'``: bucket i is [edge_i, edge_{i+1}); ``close_extreme``
    closes the outermost edge so the max value lands in the last bucket.
    ``include_under``/``include_over`` add underflow/overflow buckets (which
    shift indices by one on the left).
    """
    edges = list(buckets)
    n = len(edges) - 1
    base = 1 if include_under else 0
    expr = F.lit(None).cast("int")
    chain = F.when(F.lit(False), F.lit(0))
    for i in range(n):
        lo, hi = F.lit(edges[i]), F.lit(edges[i + 1])
        if closed == "left":
            cond = (col >= lo) & ((col <= hi) if (close_extreme and i == n - 1) else (col < hi))
        else:
            cond = ((col >= lo) if (close_extreme and i == 0) else (col > lo)) & (col <= hi)
        chain = chain.when(cond, F.lit(i + base))
    if include_under:
        under = (col < F.lit(edges[0])) if closed == "left" or close_extreme else (col <= F.lit(edges[0]))
        chain = chain.when(under, F.lit(0))
    if include_over:
        over = (col > F.lit(edges[-1])) if closed == "right" or close_extreme else (col >= F.lit(edges[-1]))
        chain = chain.when(over, F.lit(n + base))
    return chain.otherwise(expr)


def _cumwindow(order_by: Sequence[Column | str]) -> WindowSpec:
    return Window.orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)


def cumsum(col: Column, order_by: Sequence[Column | str]) -> Column:
    return F.sum(col).over(_cumwindow(order_by))


def cummean(col: Column, order_by: Sequence[Column | str]) -> Column:
    return F.avg(col).over(_cumwindow(order_by))


def cummax(col: Column, order_by: Sequence[Column | str]) -> Column:
    return F.max(col).over(_cumwindow(order_by))


def cummin(col: Column, order_by: Sequence[Column | str]) -> Column:
    return F.min(col).over(_cumwindow(order_by))


def equidepth_histogram(df, col: str, buckets: int = 10):
    """Equi-depth (equal-frequency) histogram: exact interpolated quantile
    boundaries + per-bucket counts. Returns (bucket, lo, hi, n) with
    ``bucket`` 0-based; a value equal to a boundary belongs to the bucket
    above it (strict ``<`` count of boundaries below).

    Scale shape: boundaries come from one ``percentile`` aggregate (a
    single combined row — the sort is inside the agg buffer, never a
    global exchange); assignment is an in-row filtered-size over the
    boundary array after a one-row broadcast cross join; the final count
    is an ordinary hash aggregate on a ``buckets``-ary key. For 100 TB
    swap ``percentile`` for ``approx_percentile`` — same plan, sketch
    accuracy instead of an exact in-buffer sort."""
    qs = [i / buckets for i in range(1, buckets)]
    bounds = df.select(
        F.percentile(F.col(col), F.array(*[F.lit(q) for q in qs])).alias("__bounds")
    )
    c = F.col(col)
    bucket = F.size(F.filter(F.col("__bounds"), lambda b: b < c))
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), c.alias("__v"))
        .groupBy("bucket")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )

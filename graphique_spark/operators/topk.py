"""Top-k and rank-filter operators.

Reference ``order(by, limit, over)`` / ``first(by, rank, dense, over)``
(reference interface.py:245-299, core.py:31-40). Spark-first notes:

* Global ``order + limit`` compiles to ``TakeOrderedAndProject`` — a
  per-partition top-k followed by a driver merge; no global sort. Always
  prefer it over window tricks for the global case.
* Per-group top-k uses ``row_number/rank/dense_rank`` over a keyed window and
  a ``<= k`` filter; Catalyst's ``InferWindowGroupLimit`` (Spark 3.5+) pushes
  the limit into the sort, so each group only keeps k rows per partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sort_keys(by: Sequence[str]) -> list[Column]:
    """``'-'`` prefix means descending (reference core.py:26-28)."""
    return [F.col(k[1:]).desc() if k.startswith("-") else F.col(k) for k in by]


def top_k(
    df: DataFrame, by: Sequence[str], limit: int | None = None, over: Sequence[str] = ()
) -> DataFrame:
    """Sort by keys; optionally keep the first ``limit`` rows, globally or
    per ``over`` group."""
    keys = sort_keys(by)
    if not over:
        out = df.orderBy(*keys)
        return out.limit(limit) if limit is not None else out
    w = Window.partitionBy(*over).orderBy(*keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(limit or 1))
        .drop("__rn")
    )


def rank_filter(
    df: DataFrame,
    by: Sequence[str],
    rank: int = 1,
    dense: bool = False,
    over: Sequence[str] = (),
) -> DataFrame:
    """Keep rows whose (dense_)rank over the sort keys is <= ``rank``,
    keeping ties (reference ``first``, interface.py:269-299)."""
    keys = sort_keys(by)
    fn = F.dense_rank() if dense else F.rank()
    w = Window.partitionBy(*over).orderBy(*keys)
    return df.withColumn("__rk", fn.over(w)).filter(F.col("__rk") <= rank).drop("__rk")

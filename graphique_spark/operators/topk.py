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

from functools import reduce
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
    per ``over`` group.

    Without ``limit`` the frame is simply sorted (``over`` is ignored,
    mirroring the reference, whose ``order`` only consults ``over`` when a
    limit is present). ``limit=0`` is an empty result, not 1-per-group.
    """
    keys = sort_keys(by)
    if limit is None:
        return df.orderBy(*keys)
    if not over:
        return df.orderBy(*keys).limit(limit)
    if limit <= 0:
        return df.limit(0)
    w = Window.partitionBy(*over).orderBy(*keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(limit))
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
    keeping ties (reference ``first``, interface.py:269-299).

    The global case (no ``over``) never builds an unpartitioned window
    (which would funnel every row through one task): it aggregates the
    distinct sort-key tuples with counts (map-side partial agg +
    TakeOrderedAndProject), keeps the qualifying first-k tuples, and
    broadcast-semi-joins them back — the Spark shape of the reference's
    first-k-distinct-values semi-join (reference interface.py:287-299).
    """
    keys = sort_keys(by)
    if not over:
        return _global_rank_filter(df, by, rank, dense)
    fn = F.dense_rank() if dense else F.rank()
    w = Window.partitionBy(*over).orderBy(*keys)
    return df.withColumn("__rk", fn.over(w)).filter(F.col("__rk") <= rank).drop("__rk")


def _global_rank_filter(df: DataFrame, by: Sequence[str], rank: int, dense: bool) -> DataFrame:
    """Semi-join against the first-``rank`` distinct key tuples.

    dense_rank <= k keeps rows from the first k distinct tuples. rank <= k
    keeps tuples whose preceding cumulative row count is < k — at most k
    distinct tuples either way, so the running sum is computed on a frame
    already cut to k rows by TakeOrderedAndProject.
    """
    # same one-char convention sort_keys uses (lstrip would eat every
    # leading dash of a column literally named "-x")
    cols = [k[1:] if k.startswith("-") else k for k in by]
    keys = sort_keys(by)
    qualifying = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__cnt")).orderBy(*keys).limit(rank)
    if not dense:
        w = Window.orderBy(*keys).rowsBetween(Window.unboundedPreceding, -1)
        qualifying = (
            qualifying.withColumn("__prev", F.coalesce(F.sum("__cnt").over(w), F.lit(0)))
            .filter(F.col("__prev") < rank)
        )
    qualifying = qualifying.select(*[F.col(c).alias(f"__q_{c}") for c in cols])
    cond = reduce(
        lambda a, b: a & b,
        [df[c].eqNullSafe(qualifying[f"__q_{c}"]) for c in cols],
    )
    return df.join(F.broadcast(qualifying), on=cond, how="left_semi")

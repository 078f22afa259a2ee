"""Range (point-in-interval) join without a nested-loop.

Spark compiles a raw ``p BETWEEN lo AND hi`` join condition to
BroadcastNestedLoopJoin (or a cartesian) — O(n*m) comparisons and a
broadcast requirement. Bucketing turns it into an equi-join: points map to
``floor(p / width)``, each range explodes across the buckets it covers,
the bucket key equi-joins (shuffle or broadcast hash — Catalyst's choice),
and the exact BETWEEN predicate filters residual candidates. Cost scales
with points + total covered buckets, not points x ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PBUCKET = "__rj_pbucket"
_RBUCKET = "__rj_rbucket"

_SUPPORTED_HOW = {"inner", "left", "left_outer", "semi", "left_semi", "anti", "left_anti"}


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every range row with ``lo <= point <= hi``.

    ``bucket_width`` tunes the bucket granularity: pick ~the median range
    width, so a typical range explodes to O(1) buckets while each point
    probes exactly one. Too-wide ranges multiply the (slim) exploded range
    rows, never the fact rows.

    ``how``: inner / left (point rows with no containing range are kept,
    range columns null) / semi / anti — all point-side preserving, so the
    single-bucket-per-point property keeps them duplicate-free. right/full
    are rejected: an unmatched range row appears once per covered bucket
    after the explode, so null-extension there would fabricate duplicates.

    Inverted ranges (``lo > hi``) and null bounds match nothing (they are
    pruned before the bucket explode, which would otherwise throw on a
    descending ``sequence``).
    """
    if how not in _SUPPORTED_HOW:
        raise ValueError(
            f"range_join supports how in {sorted(_SUPPORTED_HOW)}, got {how!r}: "
            "right/full would duplicate unmatched range rows (one per covered "
            "bucket after the explode)"
        )
    if bucket_width <= 0:
        # floor(x/0) is NULL: the bucket equality would silently match
        # nothing instead of surfacing the config error
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    p = points.withColumn(_PBUCKET, F.floor(F.col(point) / bucket_width))
    r = (
        ranges.filter(F.col(lo) <= F.col(hi))  # prunes inverted + null bounds
        .withColumn(
            _RBUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bucket_width),
                    F.floor(F.col(hi) / bucket_width),
                )
            ),
        )
    )
    # The BETWEEN lives in the join condition, not a post-filter: Catalyst
    # still extracts the bucket equality into SMJ/SHJ keys, and null-extended
    # rows of an outer join survive (a post-filter would silently degrade
    # left joins to inner).
    cond = (
        (p[_PBUCKET] == r[_RBUCKET])
        & (p[point] >= r[lo])
        & (p[point] <= r[hi])
    )
    out = p.join(r, on=cond, how=how)
    if how in ("semi", "left_semi", "anti", "left_anti"):
        return out.drop(_PBUCKET)
    return out.drop(_PBUCKET).drop(_RBUCKET)

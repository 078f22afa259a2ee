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

_BUCKET = "__rj_bucket"


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
    rows, never the fact rows."""
    p = points.withColumn(_BUCKET, F.floor(F.col(point) / bucket_width))
    r = ranges.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width), F.floor(F.col(hi) / bucket_width)
            )
        ),
    )
    out = p.join(r, on=_BUCKET, how=how).filter(
        (F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))
    )
    return out.drop(_BUCKET)

"""Approximate query processing over deterministic hash samples.

At 100 TB, interactive exploration can't scan the table per question;
the standard answer is a fixed sample with error bars. These helpers use
a DETERMINISTIC md5-hash sample (the same replay-safe discipline as the
engine's sampling operators: no RNG state, stable across runs, engines,
and cluster sizes — so a DuckDB oracle reproduces the estimates
bit-for-bit) and Horvitz-Thompson scaling with CLT confidence
intervals:

* count estimate:  n_hat = n_s / f,      half-width = z * sqrt(n_s * (1-f)) / f
* sum estimate:    s_hat = sum(x) / f,   half-width = z * sqrt((1-f) * sum(x^2)) / f

Scale shape: the sample predicate is a map-side hash comparison pushed
below the aggregate, so the scan reads every row but the shuffle carries
only the f-fraction; with the sample MATERIALIZED once (write the
sampled rows to their own table), every subsequent question costs f of
the full scan too — the pattern a BI layer runs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphique_spark.llm.dedup import hash60

#: sample-space granularity for the hash threshold (1e6 buckets)
_SPACE = 1_000_000


def hash_sample_predicate(key: Column, fraction: float) -> Column:
    """Deterministic membership test keeping ~``fraction`` of rows:
    ``hash60(key) % 1e6 < fraction * 1e6``. The same expression is
    writable in any engine with md5 (DuckDB oracle form:
    ``('0x' || substr(md5(k), 1, 15))::BIGINT % 1000000 < t``)."""
    return F.pmod(hash60(key.cast("string")), F.lit(_SPACE)) < int(
        fraction * _SPACE
    )


def approx_group_agg(
    df: DataFrame,
    by: Sequence[str],
    key: Column,
    sums: Sequence[str] = (),
    fraction: float = 0.1,
    z: float = 1.96,
) -> DataFrame:
    """Group-by estimates from a hash sample: per group, the estimated
    row count and each ``sums`` column's estimated total, each with a
    ``z``-sigma CLT half-width (``ci_*`` columns). ``key`` must identify
    rows uniquely (it seeds the deterministic sample)."""
    f = float(fraction)
    sampled = df.where(hash_sample_predicate(key, f))
    aggs = [
        F.count(F.lit(1)).alias("__ns"),
        *[F.sum(c).alias(f"__s_{c}") for c in sums],
        *[F.sum(F.col(c) * F.col(c)).alias(f"__s2_{c}") for c in sums],
    ]
    grouped = sampled.groupBy(*by).agg(*aggs)
    out = grouped.select(
        *by,
        (F.col("__ns") / f).cast("double").alias("est_rows"),
        (F.lit(z) * F.sqrt(F.col("__ns") * (1.0 - f)) / f).alias("ci_rows"),
        *[
            x
            for c in sums
            for x in (
                (F.col(f"__s_{c}") / f).cast("double").alias(f"est_{c}"),
                (
                    F.lit(z) * F.sqrt((1.0 - f) * F.col(f"__s2_{c}")) / f
                ).alias(f"ci_{c}"),
            )
        ],
    )
    return out

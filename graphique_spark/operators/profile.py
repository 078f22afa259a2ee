"""Single-pass table profiling: per-column null counts, distinct counts,
and min/max — the data-quality summary every ingest job wants.

Scale shape: ONE distributed scan computes every metric as aggregate
expressions in a single ``agg`` (partial/map-side combine; multiple
count-distincts expand to one Expand + partial aggs under Catalyst — still
one pass over the data). The single result row is reshaped to long format
on the driver (bounded by #columns, never by rows). ``exact=False`` swaps
``count_distinct`` for HLL ``approx_count_distinct`` when the distinct
cardinality itself is huge.

Numeric extrema are emitted floor-scaled (×1e6, BIGINT) so cross-engine
float representation can't leak into value comparisons; string/date/
timestamp extrema are emitted as strings (ISO formats match across
engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")

PROFILE_SCHEMA = (
    "column string, dtype string, n_rows bigint, n_nulls bigint, "
    "n_distinct bigint, min_num_scaled bigint, max_num_scaled bigint, "
    "min_str string, max_str string"
)


def _scaled(col):
    return F.floor(col.cast("double") * 1000000.0 + F.lit(0.5)).cast("long")


def profile(df: DataFrame, columns: Sequence[str] | None = None, exact: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all) in one pass; returns one row per
    column with schema :data:`PROFILE_SCHEMA`."""
    dtypes = dict(df.dtypes)
    cols = list(columns or df.columns)
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        kind = dtypes[c]
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"nd_{c}"))
        if kind.startswith(_NUMERIC):
            aggs.append(_scaled(F.min(c)).alias(f"mn_{c}"))
            aggs.append(_scaled(F.max(c)).alias(f"mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"ms_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"xs_{c}"))
    row = df.agg(*aggs).first()  # ONE scan; single bounded row
    out = []
    for c in cols:
        kind = dtypes[c]
        numeric = kind.startswith(_NUMERIC)
        out.append(
            (
                c,
                kind,
                row["__n"],
                row["__n"] - row[f"nn_{c}"],
                row[f"nd_{c}"],
                row[f"mn_{c}"] if numeric else None,
                row[f"mx_{c}"] if numeric else None,
                None if numeric else row[f"ms_{c}"],
                None if numeric else row[f"xs_{c}"],
            )
        )
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)

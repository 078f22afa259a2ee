"""Incremental aggregation via mergeable partial states.

A 100 TB pipeline never re-aggregates the whole corpus when a day of new
data lands: it keeps per-key partial states (count/sum/min/max — and avg,
variance as (n, sum, sum-of-squares)) and folds each delta in. This is the
batch mirror of Structured Streaming's stateful aggregation: same algebra,
state in a table instead of a state store.

Every state column is an algebraic/distributive aggregate, so each stage
is map-side combinable and the merge is a groupBy over (old ∪ delta) —
linear in state size, independent of history size.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind -> (state columns builder, merge exprs, finalize expr)
_KINDS = ("count", "sum", "min", "max", "avg", "var")


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, str]],
) -> DataFrame:
    """Reduce ``df`` to one partial-state row per key. ``aggs`` maps an
    output alias to (kind, column); kinds: count, sum, min, max, avg, var
    (population). State columns are ``<alias>__n/__s/__s2/__min/__max`` as
    the kind requires."""
    exprs = []
    for alias, (kind, col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported kind {kind!r} (one of {_KINDS})")
        c = F.col(col)
        if kind == "count":
            exprs.append(F.count(c).alias(f"{alias}__n"))
        elif kind == "sum":
            exprs.append(F.sum(c).alias(f"{alias}__s"))
        elif kind == "min":
            exprs.append(F.min(c).alias(f"{alias}__min"))
        elif kind == "max":
            exprs.append(F.max(c).alias(f"{alias}__max"))
        elif kind == "avg":
            exprs.append(F.count(c).alias(f"{alias}__n"))
            exprs.append(F.sum(c).alias(f"{alias}__s"))
        elif kind == "var":
            exprs.append(F.count(c).alias(f"{alias}__n"))
            exprs.append(F.sum(c).alias(f"{alias}__s"))
            exprs.append(F.sum(c * c).alias(f"{alias}__s2"))
    return df.groupBy(*keys).agg(*exprs)


def merge_states(
    states: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Fold any number of partial-state tables into one: union + groupBy,
    summing the sums/counts and re-min/maxing the extrema. Associative and
    commutative — daily states can be merged pairwise, hierarchically, or
    all at once."""
    from functools import reduce

    if not states:
        raise ValueError("merge_states: no states")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    exprs = []
    for name in unioned.columns:
        if name in keys:
            continue
        if name.endswith(("__n", "__s", "__s2")):
            exprs.append(F.sum(name).alias(name))
        elif name.endswith("__min"):
            exprs.append(F.min(name).alias(name))
        elif name.endswith("__max"):
            exprs.append(F.max(name).alias(name))
        else:
            raise ValueError(f"not a state column: {name!r}")
    return unioned.groupBy(*keys).agg(*exprs)


def finalize_state(
    state: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, Tuple[str, str]],
) -> DataFrame:
    """Turn partial states into final aggregate values (one column per
    alias). avg = s/n; var is the population variance (s2/n - (s/n)^2,
    clamped at 0 for fp noise)."""
    cols = [F.col(k) for k in keys]
    for alias, (kind, _) in aggs.items():
        if kind == "count":
            cols.append(F.col(f"{alias}__n").alias(alias))
        elif kind == "sum":
            cols.append(F.col(f"{alias}__s").alias(alias))
        elif kind == "min":
            cols.append(F.col(f"{alias}__min").alias(alias))
        elif kind == "max":
            cols.append(F.col(f"{alias}__max").alias(alias))
        elif kind == "avg":
            cols.append((F.col(f"{alias}__s") / F.col(f"{alias}__n")).alias(alias))
        elif kind == "var":
            n, s, s2 = (F.col(f"{alias}__{x}") for x in ("n", "s", "s2"))
            # when-guard: with n=0 the expression is NULL and F.greatest
            # SKIPS nulls, returning the 0.0 clamp — an all-null group
            # must report NULL variance (matching avg), not 0.0
            var = F.greatest(s2 / n - (s / n) * (s / n), F.lit(0.0))
            cols.append(F.when(n > 0, var).alias(alias))
    return state.select(*cols)

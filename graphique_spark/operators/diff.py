"""Snapshot diff: row-level change detection between two table versions.

A training-data pipeline re-crawls, re-filters, and re-scores its corpus;
the diff between two snapshots (what was added, what disappeared, what
changed in place) is the audit trail for every downstream invalidation.

Scale shape: one full-outer shuffle join on the key columns — both sides
reduced map-side to (key, fingerprint) before the exchange, so the shuffle
carries 8-byte hashes instead of document bodies regardless of row width.
On pre-bucketed snapshot tables the exchange disappears entirely.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "\x00<null>"


def _fingerprint(columns: Sequence[str]):
    """Order-stable row hash over the compared columns; NULL is distinct
    from any real value (including the empty string)."""
    return F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in columns]
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots as added / removed /
    changed (/ unchanged). ``compare`` defaults to the non-key columns
    present on BOTH sides; a column present on one side only is ignored
    (schema evolution is not a per-row change).

    Returns one row per key: (*keys, change). Keys are taken from
    whichever side has the row; duplicate keys within one snapshot are
    collapsed by fingerprint-set semantics (any difference in the
    multiset of fingerprints reads as changed).
    """
    keys = list(keys)
    if compare is None:
        compare = [c for c in old.columns if c not in keys and c in new.columns]
    if not compare:
        raise ValueError("snapshot_diff: no comparable non-key columns")
    # map-side reduce each snapshot to (key, fingerprint-of-sorted-hashes):
    # slim shuffle rows + dup-key collapse in one pass
    o = (
        old.select(*keys, _fingerprint(compare).alias("_fp"))
        .groupBy(*keys)
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(F.collect_list("_fp")))).alias("_old"))
    )
    n = (
        new.select(*keys, _fingerprint(compare).alias("_fp"))
        .groupBy(*keys)
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(F.collect_list("_fp")))).alias("_new"))
    )
    # null-safe key match: a plain on= join never matches NULL keys, so an
    # identical null-keyed row would surface as both 'added' AND 'removed'
    n = n.select(*[F.col(k).alias(f"__n_{k}") for k in keys], "_new")
    cond = None
    for k in keys:
        c = o[k].eqNullSafe(n[f"__n_{k}"])
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(F.col("_old") != F.col("_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.coalesce(o[k], F.col(f"__n_{k}")).alias(k) for k in keys],
        change.alias("change"),
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out

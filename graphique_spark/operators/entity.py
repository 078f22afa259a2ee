"""Entity resolution: blocked fuzzy matching over identifier strings.

The master-data/dedup-customer-records workload: find record pairs whose
key strings are within a small edit distance. The quadratic trap is the
pair space — 10⁹ names cannot all-pairs Levenshtein. Standard answer:
**blocking** — a cheap deterministic key (prefix, length band, phonetic
code) that any true match must share — then exact distance only within
blocks.

Scale shape: one map-side blocking-key projection, one equi-join on the
block key (pair volume = Σ block_size², controlled by the blocking
choice), Levenshtein only on candidates. A length-band conjunct is
derived automatically: edit distance ≤ d implies |len(a) − len(b)| ≤ d,
so the join condition prunes before the (expensive) distance evaluates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    key: str,
    block: Column,
    id_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Record pairs whose ``key`` strings are within ``max_distance`` edits,
    compared only inside ``block`` groups (any true match must share the
    blocking key — recall rests on that choice; a char-swap-tolerant block
    like sorted-prefix or phonetic code catches more than a raw prefix).
    Returns (id_a, id_b, key_a, key_b, distance)."""
    recs = df.select(
        F.col(id_col).alias("id"),
        F.col(key).alias("k"),
        block.alias("blk"),
        F.length(key).alias("ln"),
    )
    a = recs.toDF("id_a", "k_a", "blk", "ln_a")
    b = recs.toDF("id_b", "k_b", "blk", "ln_b")
    return (
        a.join(b, on="blk")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length-band prune: cheap int compare before Levenshtein
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= max_distance)
        )
        .withColumn("distance", F.levenshtein("k_a", "k_b"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "k_a", "k_b", "distance")
    )

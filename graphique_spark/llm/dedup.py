"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the part that matters at 100 TB):

* **Signatures are map-side.** Shingling and MinHash use higher-order
  functions (``transform``/``array_min``) over an in-row shingle array —
  no explode, no shuffle, no Python. A 100 TB corpus streams through the
  signature stage embarrassingly parallel.
* **Only band keys shuffle.** LSH explodes to ``bands`` rows per doc (a
  small constant) and groups by band hash; candidate pairs come from
  within-bucket joins, never an all-pairs product.
* **Verification is candidate-pruned.** True Jaccard is computed only for
  candidate pairs via a join back to the (distinct) shingle arrays.

Hashes are md5-based so a SQL oracle (DuckDB) can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-grams as an array (in-row, no explode)."""
    n = F.length(col) - (k - 1)
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda i: col.substr(i, F.lit(k)))
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) as an array."""
    words = F.split(F.trim(col), r"\s+")
    count = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), count - 1),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 8) -> Column:
    """MinHash signature: per seed, the min md5 of (shingle, seed) — an
    array of ``num_hashes`` hex strings. String-min is deterministic and
    identical in any engine with md5."""
    def seed_min(seed: str) -> Column:
        # factory keeps the lambda unary — pyspark dispatches a 2-param
        # transform lambda as the (element, index) form
        return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(seed)))))

    return F.array(*[seed_min(f"#{i}") for i in range(num_hashes)])


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Hash each band of the signature: array of ``bands`` md5 keys."""
    return F.array(
        *[
            F.md5(F.concat_ws("|", *[F.get(signature, b * rows + r) for r in range(rows)]))
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash-LSH, with exact shingle
    Jaccard computed for each candidate. Returns (id_a, id_b, jaccard)."""
    rows = num_hashes // bands
    shingled = df.select(
        F.col(id_col).alias("id"), char_shingles(F.col(text), k).alias("sh")
    )
    banded = shingled.select(
        "id", "sh", F.posexplode(lsh_bands(minhash_signature(F.col("sh"), num_hashes), bands, rows)).alias("band", "key")
    )
    left = banded.select(F.col("band"), F.col("key"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = banded.select(F.col("band"), F.col("key"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        left.join(right, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprint(shingles: Column, bits: int = 16) -> Column:
    """SimHash over a shingle array: per bit, sum +1/-1 by that bit of each
    shingle's hash; the sign pattern forms the fingerprint. Pure
    higher-order-function arithmetic (no explode, no UDF)."""
    hashed = F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    def bit_vote(mask: int) -> Column:
        # closure keeps the lambda at exactly two params (acc, h) — pyspark
        # dispatches higher-order lambdas on arity
        return F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    fingerprint = F.lit(0).cast("long")
    for b in range(bits):
        fingerprint = fingerprint + F.when(bit_vote(1 << b) >= 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
    return fingerprint


def exact_duplicates(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", normalized: bool = False
) -> DataFrame:
    """Exact-duplicate groups by content hash: returns
    (content_hash, n_copies, keep_id) for groups with n>1, where keep_id is
    the smallest id (the canonical survivor)."""
    from graphique_spark.llm.text import doc_fingerprint

    key = doc_fingerprint(F.col(text)) if normalized else F.md5(F.col(text))
    return (
        df.select(key.alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    block_by: Column | None = None,
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard *within blocking buckets* (never a global
    cross product). Default block: language + coarse length bucket."""
    block = block_by if block_by is not None else (F.floor(F.length(text) / 100))
    docs = df.select(
        F.col(id_col).alias("id"), block.alias("block"), word_ngrams(F.col(text), n).alias("ng")
    )
    left = docs.select(F.col("block"), F.col("id").alias("id_a"), F.col("ng").alias("ng_a"))
    right = docs.select(F.col("block"), F.col("id").alias("id_b"), F.col("ng").alias("ng_b"))
    inter = F.size(F.array_intersect("ng_a", "ng_b")).cast("double")
    union = F.size(F.array_union("ng_a", "ng_b")).cast("double")
    return (
        left.join(right, on="block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )

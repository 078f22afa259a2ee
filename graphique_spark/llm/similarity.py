"""Embedding similarity search over an ``array<float>`` column.

* :func:`brute_force_topk` — exact cosine top-k; one scan, no shuffle
  beyond the final top-k (Spark's TakeOrderedAndProject). The right
  baseline, and often the right answer even at scale when the query count
  is small (100 TB scan is embarrassingly parallel).
* :func:`lsh_ann_topk` — sign-random-projection LSH: deterministic
  hyperplanes derived from md5, bucket by bit signature, search only the
  query's bucket (and optionally neighboring probes). The scale path when
  query volume is high: the bucket join prunes the scan by ~2^planes.

The dot product is a ``zip_with`` + ``aggregate`` higher-order expression —
JVM-side, no Python. Elements are cast to double first so results are
bit-reproducible across engines (float32 summation is not).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    Plan shape: scan → per-row expression → TakeOrderedAndProject. No
    shuffle of the embeddings themselves; scales linearly with executors.
    """
    q = F.array(*[F.lit(float(v)) for v in query])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible in
    any engine (and in the SQL oracle) without a random seed exchange."""
    import hashlib

    weights = []
    for i in range(dim):
        digest = hashlib.md5(f"plane{plane}:{i}".encode()).hexdigest()
        weights.append((int(digest[:8], 16) % 2001 - 1000) / 1000.0)
    return weights


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bit per hyperplane, packed into an int bucket id."""
    v = _as_double(vec)
    bucket = F.lit(0)
    for p, weights in enumerate(planes):
        w = F.array(*[F.lit(x) for x in weights])
        bucket = bucket + F.when(dot(v, w) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    centroid_stride: int = 37,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into cells around
    centroids, probe only the ``nprobe`` cells nearest the query.

    Centroids here are a deterministic stride sample (``id % stride == 0``)
    so the whole index build is a pure, reproducible dataflow; a real
    deployment would swap in k-means centroids built offline — the probe
    and assignment plumbing is identical. Assignment is a broadcast
    cross-join + ``max_by`` (map-side; no shuffle of the embeddings), so
    build cost is linear in rows × centroids. At scale the table would be
    written partitioned by ``cell`` and a probe reads ``nprobe`` partitions
    only.
    """
    cents = df.filter((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
    )
    sim = cosine_similarity(F.col(vec_col), F.col("cvec"))
    assigned = (
        df.crossJoin(F.broadcast(cents))
        .select(F.col(id_col), F.col(vec_col), F.col("cent_id"), sim.alias("csim"))
        .groupBy(id_col)
        .agg(F.max_by("cent_id", "csim").alias("cell"), F.first(vec_col).alias(vec_col))
    )
    q = F.array(*[F.lit(float(v)) for v in query])
    probe = [
        r["cent_id"]
        for r in cents.select(
            "cent_id", cosine_similarity(F.col("cvec"), q).alias("qsim")
        )
        .orderBy(F.col("qsim").desc(), F.col("cent_id"))
        .limit(nprobe)
        .collect()
    ]
    qsim = cosine_similarity(F.col(vec_col), q)
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(F.col(id_col), qsim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """k-NN join: exact cosine top-k *per query vector* — the batch shape
    of similarity search (one query → use :func:`brute_force_topk`).

    The query set broadcasts (it is the small side by construction); the
    corpus streams through map-side, so cost is |corpus| × |queries| dot
    products with no corpus shuffle; the per-query top-k window runs on
    |queries| × |corpus| scored rows partitioned by query id. At scale,
    bucket both sides (LSH/IVF cell) first and join on the cell instead of
    cross-joining.
    Returns (query_id, vec_id, cosine) with rank <= k per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        cosine_similarity(F.col(vec_col), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.98,
    num_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by sign-projection
    LSH bucket: only within-bucket pairs are compared (near-identical
    vectors land in the same bucket with high probability), so the pair
    count is ~n²/2^planes instead of n². Returns (id_a, id_b, cosine)."""
    planes = [_hyperplane(p, _dim(df, vec_col)) for p in range(num_planes)]
    docs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    left = docs.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    right = docs.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine_similarity(F.col("v_a"), F.col("v_b"))
    return (
        left.join(right, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _dim(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


def lsh_ann_topk(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_planes: int = 4,
    probe_radius: int = 1,
) -> DataFrame:
    """Approximate top-k with multi-probe: candidates come from every
    bucket within hamming distance ``probe_radius`` of the query's bucket
    (radius 0 = single bucket; 1 probes ``planes+1`` of the ``2^planes``
    buckets — the standard recall/cost dial for sign-projection LSH).

    At scale the bucket column is precomputed and the table partitioned by
    it; a probe set of B buckets is a partition-pruned scan of ~B/2^planes
    of the data, and the bucket filter (an IN on a small literal set) pushes
    down to the parquet scan.
    """
    dim = len(query)
    planes = [_hyperplane(p, dim) for p in range(num_planes)]
    q = F.array(*[F.lit(float(v)) for v in query])
    query_bucket = (
        df.sparkSession.range(1).select(lsh_bucket(q, planes).alias("b")).first()["b"]
    )
    probe_buckets = [
        b for b in range(1 << num_planes) if bin(b ^ query_bucket).count("1") <= probe_radius
    ]
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
        .filter(F.col("bucket").isin(probe_buckets))
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )

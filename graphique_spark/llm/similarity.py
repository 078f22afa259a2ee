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
from pyspark.sql import types as T


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector (failed encode / padding row) yields
    # NULL instead of an ANSI DIVIDE_BY_ZERO job failure; NULLs sort last
    # under the desc top-k orderings every caller uses
    a, b = _as_double(a), _as_double(b)
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _cos_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine over PRE-CAST double arrays with PRE-COMPUTED norms: one
    array aggregate (the dot) per evaluation instead of three. The pair
    stage of every kNN/LSH join evaluates cosine |pairs| times while the
    norms only vary per ROW — hoisting them before the join removes 2/3
    of the higher-order-function work from the hot path. Same try_divide
    NULL-on-zero-norm contract as :func:`cosine_similarity`."""
    return F.try_divide(dot(a, b), na * nb)


def _cos_lit(v: Column, vn: Column, vec: Sequence[float]) -> Column:
    """Cosine of a pre-cast double vector (norm ``vn``) against a
    driver-side literal vector: the literal's norm is a Python float, so
    each row evaluates ONE array aggregate — centroid-assignment loops
    (k cells per row) otherwise recompute the row norm k times and fold
    a dim-length literal aggregate per cell."""
    import math

    n = math.sqrt(sum(float(x) * float(x) for x in vec))
    cv = F.array(*[F.lit(float(x)) for x in vec])
    return F.try_divide(dot(v, cv), vn * F.lit(n))


def _with_vec_norm(
    df: DataFrame, vec_col: str, v_name: str, n_name: str
) -> DataFrame:
    """Attach the pre-cast double vector and its norm as columns — the
    per-row hoist :func:`_cos_pre` / :func:`_cos_lit` consume."""
    return df.withColumn(v_name, F.col(vec_col).cast("array<double>")).withColumn(
        n_name, norm(F.col(v_name))
    )


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
    d = _with_vec_norm(df, vec_col, "__v", "__n")
    sim = _cos_lit(F.col("__v"), F.col("__n"), query)
    return (
        d.select(F.col(id_col), sim.alias("cosine"))
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


def hash60(col: Column) -> Column:
    """Oracle-reproducible 60-bit hash: ``conv(substr(md5, 1, 15), 16, 10)``
    == DuckDB ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def fit_centroids(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 20,
    seed: int = 0,
    sample_fraction: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Offline k-means centroids (Spark ML KMeans — distributed Lloyd's)
    for :func:`ivf_topk` / :func:`assign_clusters` ``centroids=``.

    The hash-sampled default centroids are deterministic and free but
    arbitrary; k-means centroids track the data distribution, so IVF cells
    are balanced and probes recall more true neighbors. At 100 TB: fit on
    ``sample_fraction`` (k-means quality saturates quickly with sample
    size), persist the returned list (k × dim floats — kilobytes), and
    reuse across queries; fitting is offline, assignment plans are
    identical to the hash-centroid path.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    if sample_fraction is not None:
        feats = feats.sample(sample_fraction, seed=seed)
    # Deliberately NOT persisted (measured-and-reverted, VERDICT r12
    # item 5): when the input dataset is unpersisted, MLlib's KMeans
    # detects storageLevel == NONE and caches its own converted
    # norm-augmented instance RDD across the ~19 k-means|| jobs. A caller
    # persist flips that detection OFF, so every orchestration job
    # re-runs the row->vector conversion from our cached rows instead —
    # interleaved A/B measured the persist variant at 0.84x (min 4.58s
    # -> 5.47s, 4 alternating legs, bench_history/ab_r13_ivf/).
    model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    return [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]


def _hash_sampled_centroids(
    df: DataFrame, num: int, vec_col: str, id_col: str
) -> list[tuple[int, list[float]]]:
    """Deterministic fixed-size centroid sample: the ``num`` rows with the
    smallest ``hash60(id)`` — a hash-ordered top-k (TakeOrderedAndProject,
    no shuffle of the vectors). Fixed k keeps the centroid broadcast and
    the n × k assignment cost bounded no matter the corpus size."""
    rows = (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(hash60(F.col("cid")), F.col("cid"))
        .limit(num)
        .collect()
    )  # tiny: num rows, collected once at plan-build
    # cid stays the raw id value: it is only an opaque cell label
    # (int() would crash on string vector ids, which hash60 supports)
    return [(r["cid"], [float(x) for x in r["cvec"]]) for r in rows]


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into cells around
    centroids, probe only the ``nprobe`` cells nearest the query.

    Default centroids are a *fixed-size* deterministic hash sample (see
    :func:`_hash_sampled_centroids`) — a stride sample (``id % s == 0``)
    would grow O(n) and blow up at scale. Pass ``centroids=`` (e.g. from
    :func:`fit_centroids`) for k-means cells; the probe and assignment
    plumbing is identical. Assignment is a pure map-side expression over
    centroid literals (no shuffle of the embeddings). At scale the table
    would be written partitioned by ``cell`` and a probe reads ``nprobe``
    partitions only.
    """
    if centroids is None:
        centroids = _hash_sampled_centroids(df, num_centroids, vec_col, id_col)
    if not centroids:
        # empty corpus samples zero centroids: typed empty result
        return df.select(F.col(id_col), F.lit(0.0).alias("cosine")).limit(0)
    # probe choice on the driver: left-to-right fold == Spark's aggregate HOF
    def _py_cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        # zero-norm vector (failed encode / padding row sampled as a
        # centroid, or a zero query): orthogonal, not a ZeroDivisionError
        return num / (na * nb) if na and nb else 0.0

    ranked = sorted(centroids, key=lambda c: (-_py_cos(c[1], query), c[0]))
    probe = [cid for cid, _ in ranked[:nprobe]]
    # assignment as a pure map-side expression over centroid literals: no
    # cross join, no groupBy shuffle of the embeddings. cid is NEGATED in
    # the struct so F.greatest resolves equal-similarity ties to the
    # SMALLEST cid — the same preference the driver ranking above uses
    # (duplicate centroids otherwise assign a cell the probe never picks)
    d = _with_vec_norm(df, vec_col, "__v", "__n")
    cells = []
    for cid, cvec in centroids:
        sim = _cos_lit(F.col("__v"), F.col("__n"), cvec)
        cells.append(F.struct(sim.alias("s"), F.lit(-cid).alias("nc")))
    cell = -(F.greatest(*cells) if len(cells) > 1 else cells[0])["nc"]
    qsim = _cos_lit(F.col("__v"), F.col("__n"), query)
    return (
        d.withColumn("__cell", cell)
        .filter(F.col("__cell").isin(probe))
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
    q = _with_vec_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")),
        "__q",
        "__qv",
        "__qn",
    ).select("query_id", "__qv", "__qn")
    c = _with_vec_norm(corpus, vec_col, "__cv", "__cn")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        _cos_pre(F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Batch IVF ANN join: the approximate counterpart of :func:`knn_join`
    for a trained centroid table (:func:`fit_centroids`). Corpus rows get
    their nearest-centroid cell as a pure map-side expression over the
    centroid literals; each query explodes into its ``nprobe`` closest
    cells the same way; the two sides then meet on an EQUI-join on the
    cell, so scored pairs are ~|corpus| * nprobe / n_cells instead of the
    exact join's |corpus| * |queries| — the difference between linear and
    quadratic when the query set is itself large. The query side broadcasts
    (queries * nprobe rows); the corpus never shuffles.
    Returns (query_id, vec_id, cosine) with rank <= k per query."""
    if not centroids:
        # no cells -> no candidate pairs: typed empty result, matching
        # the ivf_topk empty-centroid contract
        return queries.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", queries.schema[id_col].dataType),
                    T.StructField(id_col, corpus.schema[id_col].dataType),
                    T.StructField("cosine", T.DoubleType()),
                ]
            ),
        )
    def _cells(v: Column, vn: Column) -> list[Column]:
        return [
            F.struct(_cos_lit(v, vn, cvec).alias("s"), F.lit(cid).alias("c"))
            for cid, cvec in centroids
        ]

    corp = _with_vec_norm(corpus, vec_col, "__cv", "__cn")
    ccells = _cells(F.col("__cv"), F.col("__cn"))
    nearest = (F.greatest(*ccells) if len(ccells) > 1 else ccells[0])["c"]
    # per-query probe list: rank every centroid by similarity, keep nprobe
    qpre = _with_vec_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")),
        "__q",
        "__qv",
        "__qn",
    )
    qcells = _cells(F.col("__qv"), F.col("__qn"))
    probe_arr = F.slice(F.reverse(F.array_sort(F.array(*qcells))), 1, int(nprobe))
    q = qpre.select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(F.transform(probe_arr, lambda s: s["c"])).alias("__cell"),
    )
    assigned = corp.select(
        F.col(id_col), F.col("__cv"), F.col("__cn"), nearest.alias("__cell")
    )
    scored = assigned.join(F.broadcast(q), on="__cell").select(
        "query_id",
        F.col(id_col),
        _cos_pre(F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")).alias(
            "cosine"
        ),
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
    num_planes: int | None = None,
    target_bucket_rows: int = 256,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by sign-projection
    LSH bucket: only within-bucket pairs are compared (near-identical
    vectors land in the same bucket with high probability), so the pair
    count is ~n²/2^planes instead of n². Returns (id_a, id_b, cosine).

    ``num_planes`` defaults to ``log2(n / target_bucket_rows)`` so the
    bucket count *scales with the corpus* and expected within-bucket pairs
    stay ~n · target_bucket_rows / 2 — linear in n, not quadratic. A fixed
    plane count (e.g. 16 buckets forever) reverts to n²/16 at 100× scale.
    The sizing count() is one cheap scan at plan-build time.
    """
    pairs = _bucketed_pairs(
        df, vec_col, id_col, num_planes, target_bucket_rows, checkpoint_dir
    )
    return pairs.filter(F.col("cosine") >= threshold)


def _bucketed_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int | None,
    target_bucket_rows: int,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Within-LSH-bucket (id_a, id_b, cosine) pairs — the shared blocking
    stage of near-dup detection and hard-negative mining."""
    if num_planes is None:
        import math

        # two cheap jobs, NOT one merged agg: count() answers from parquet
        # row-group metadata and first() early-exits after one row — a
        # combined agg(count, first) would full-scan the vector column
        n = df.count()
        num_planes = max(4, math.ceil(math.log2(max(n, 1) / target_bucket_rows + 1)))
    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    lead = None if first is None else first[0]
    if lead is None:
        # empty corpus (or all-NULL vectors): typed empty pair frame
        return df.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    planes = [_hyperplane(p, len(lead)) for p in range(num_planes)]
    from graphique_spark.llm.dedup import ensure_parallelism, materializer

    df = ensure_parallelism(df)
    pre = _with_vec_norm(df, vec_col, "__v", "__n")
    # materialized: both join sides consume this frame through *renamed*
    # projections, which blocks exchange reuse — without the cut the
    # num_planes×dim bucket dot products and the norm run twice per row.
    # ``checkpoint_dir`` (the standard materializer knob) switches the cut
    # to reliable storage for executor-loss tolerance on a real cluster.
    # eager=False: every consumer (both join sides) sits inside the
    # caller's first action, which populates the blocks — no dedicated job
    docs = materializer(df, checkpoint_dir, eager=False)(
        pre.select(
            F.col(id_col).alias("id"),
            F.col("__v").alias("v"),
            F.col("__n").alias("nrm"),
            lsh_bucket(F.col("__v"), planes).alias("bucket"),
        )
    )
    left = docs.select(
        "bucket",
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("n_a"),
    )
    right = docs.select(
        "bucket",
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("n_b"),
    )
    cos = _cos_pre(F.col("v_a"), F.col("v_b"), F.col("n_a"), F.col("n_b"))
    return (
        left.join(right, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .select("id_a", "id_b", "cosine")
    )


def hard_negatives(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lo: float = 0.5,
    hi: float = 0.9,
    num_planes: int | None = None,
    target_bucket_rows: int = 256,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: pairs that
    the LSH blocking deems related (same sign-projection bucket) but whose
    cosine sits in the similar-NOT-duplicate band ``[lo, hi)`` — exactly
    the negatives that teach a retriever its decision boundary; random
    negatives are trivially far and near-dups are false negatives.

    Same linear-scaling blocking as :func:`embedding_near_dups` (bucket
    count grows with the corpus), same pair stream — only the cosine band
    differs, so mining negatives costs nothing extra when run beside the
    dedup pass. Returns (id_a, id_b, cosine)."""
    pairs = _bucketed_pairs(
        df, vec_col, id_col, num_planes, target_bucket_rows, checkpoint_dir
    )
    return pairs.filter((F.col("cosine") >= lo) & (F.col("cosine") < hi))


def _dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimension from the first row; None when the frame is empty
    or the first vector is NULL (callers decide: typed empty vs error)."""
    first = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    return None if first is None else len(first[0])


def _py_bucket(vec: Sequence[float], planes: list[list[float]]) -> int:
    """Driver-side bucket of a literal vector: left-to-right fold, matching
    Spark's ``aggregate`` HOF bit-for-bit."""
    bucket = 0
    for p, weights in enumerate(planes):
        acc = 0.0
        for x, w in zip(vec, weights):
            acc += float(x) * w
        if acc >= 0:
            bucket |= 1 << p
    return bucket


def _probe_masks(num_planes: int, radius: int) -> list[int]:
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(num_planes), r):
            mask = 0
            for b in bits:
                mask |= 1 << b
            masks.append(mask)
    return masks


def write_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    num_planes: int = 4,
) -> list[list[float]]:
    """Materialize the LSH index the :func:`lsh_ann_topk` docstring promises:
    buckets precomputed once, table written hive-partitioned by ``bucket``.
    A probe is then a partition-pruned scan (the bucket IN-filter never
    touches non-probed directories) instead of recomputing every signature
    per query. Returns the hyperplanes (deterministic, so callers can also
    re-derive them from ``num_planes`` + dim)."""
    dim = _dim(df, vec_col)
    if dim is None:
        raise ValueError("cannot index an empty corpus (no vector to size hyperplanes)")
    planes = [_hyperplane(p, dim) for p in range(num_planes)]
    out = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    out.write.partitionBy("bucket").mode("overwrite").parquet(path)
    return planes


def lsh_ann_topk_indexed(
    spark,
    path: str,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    num_planes: int = 4,
    probe_radius: int = 1,
) -> DataFrame:
    """Probe a :func:`write_lsh_index` table: compute the query's bucket and
    probe set driver-side, then scan only those partitions — at scale this
    reads ~|probe|/2^planes of the data and zero signature math."""
    planes = [_hyperplane(p, len(query)) for p in range(num_planes)]
    query_bucket = _py_bucket(query, planes)
    probe = [query_bucket ^ m for m in _probe_masks(num_planes, probe_radius)]
    sim = _cos_lit(F.col("__v"), F.col("__n"), query)
    return (
        _with_vec_norm(
            spark.read.parquet(path).filter(F.col("bucket").isin(probe)),
            vec_col,
            "__v",
            "__n",
        )
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 4,
    probe_radius: int = 1,
) -> DataFrame:
    """Bucketed k-NN join — the scale path :func:`knn_join` points at.

    Both sides are LSH-bucketed; each query row explodes to its probe
    buckets (hamming <= ``probe_radius``) and equi-joins the corpus on
    ``bucket``. Comparisons scale with bucket occupancy x probe count, not
    |corpus| x |queries|. Approximate: recall follows the LSH collision
    probability; ``probe_radius=num_planes`` degenerates to exact.
    Returns (query_id, vec_id, cosine) with rank <= k per query.
    """
    dim = _dim(corpus, vec_col)
    if dim is None:  # empty corpus (or all-NULL vectors): typed empty
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("vec_id"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    planes = [_hyperplane(p, dim) for p in range(num_planes)]
    c = _with_vec_norm(corpus, vec_col, "__cv", "__cn").withColumn(
        "bucket", lsh_bucket(F.col("__cv"), planes)
    )
    masks = _probe_masks(num_planes, probe_radius)
    q = (
        _with_vec_norm(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")),
            "__q",
            "__qv",
            "__qn",
        )
        .withColumn("__qb", lsh_bucket(F.col("__qv"), planes))
        .select(
            "query_id",
            "__qv",
            "__qn",
            F.explode(
                F.array(*[F.col("__qb").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
        )
    )
    scored = c.join(F.broadcast(q), on="bucket").select(
        "query_id",
        F.col(id_col),
        _cos_pre(F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


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
    # _py_bucket matches Spark's aggregate HOF bit-for-bit (already relied
    # on by lsh_ann_topk_indexed's partition probing) — no Spark job needed
    query_bucket = _py_bucket(query, planes)
    # O(planes^radius) probe set via XOR masks — enumerating all
    # 2^planes buckets is driver-side exponential work at realistic
    # plane counts (24 planes = a 16M-iteration loop for planes+1 hits)
    probe_buckets = sorted(
        query_bucket ^ m for m in _probe_masks(num_planes, probe_radius)
    )
    sim = _cos_lit(F.col("__v"), F.col("__n"), query)
    return (
        _with_vec_norm(df, vec_col, "__v", "__n")
        .withColumn("bucket", lsh_bucket(F.col("__v"), planes))
        .filter(F.col("bucket").isin(probe_buckets))
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def assign_clusters(
    df: DataFrame,
    num_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid: one map-side pass over
    centroid literals, no shuffle of the embeddings. Returns all input
    columns + (cluster, cos_to_centroid).

    Default centroids are the deterministic hash sample (same fixed-k
    machinery as IVF); pass ``centroids=`` from :func:`fit_centroids` for
    k-means quality — the assignment plan is identical.

    The curation use: cluster-balanced sampling and per-cluster quotas —
    corpus diversity control without training a model."""
    if centroids is None:
        centroids = _hash_sampled_centroids(df, num_clusters, vec_col, id_col)
    if not centroids:
        # empty corpus samples zero centroids: typed empty result
        return df.withColumn("cluster", F.lit(0)).withColumn(
            "cos_to_centroid", F.lit(0.0)
        ).limit(0)
    pre = _with_vec_norm(df, vec_col, "__v", "__n")
    cands = []
    for cid, cvec in centroids:
        cos = _cos_lit(F.col("__v"), F.col("__n"), cvec)
        cands.append(F.struct(cos.alias("cos"), F.lit(cid).alias("cid")))
    best = F.greatest(*cands) if len(cands) > 1 else cands[0]
    return (
        pre.withColumn("cluster", best["cid"])
        .withColumn("cos_to_centroid", best["cos"])
        .drop("__v", "__n")
    )


def cluster_balanced_sample(
    df: DataFrame,
    per_cluster: int,
    num_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Up to ``per_cluster`` rows from each embedding cluster, chosen
    deterministically by id hash — the diversity-preserving subset
    selection pattern (uniform sampling over-represents dense regions).
    Per-group top-k via window rank over the (bounded) cluster key."""
    assigned = assign_clusters(df, num_clusters, vec_col, id_col)
    w = Window.partitionBy("cluster").orderBy(hash60(F.col(id_col)), F.col(id_col))
    return (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cluster)
        .drop("__rn")
    )

"""Similarity search over embedding columns: brute-force cosine top-k
(the exactness baseline) and sign-LSH bucketed ANN (the scale path).

Scale notes: the query side is always tiny relative to the corpus →
``broadcast()`` it, so the corpus never shuffles; the bucketed variant
prunes the candidate set before the dot products, turning a full scan
per query into a per-bucket micro-join.  All math is
``zip_with``/``aggregate`` higher-order functions — JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, folded left in array order (deterministic, matches the
    positional-UNNEST SQL oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries is broadcast (small side); ranking ties break on neighbor id
    so the result is fully deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sign_bucket_expr(vec: Column, bits: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: bit j = 1 iff vec[j] > 0 (first
    ``bits`` dimensions).  Deterministic, oracle-expressible; a
    random-hyperplane variant drops in by replacing the projection."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: F.when(
                F.element_at(vec, j + 1).cast("double") > 0.0,
                F.pow(F.lit(2.0), j).cast("long"),  # shiftleft needs a literal
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lsh_bucket_histogram(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Bucket occupancy — the observability query for ANN partitioning."""
    return (
        emb.select(sign_bucket_expr(F.col(vec_col), bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def l2sq_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance Σ (aᵢ−bᵢ)², JVM-side."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seeded_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the first ``n_centroids`` vectors
    by id.  In production this is replaced by k-means trained on a sample
    (same downstream plan); the seeded pick keeps the whole index
    SQL-expressible for the oracle gate."""
    w = Window.orderBy(id_col)
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.row_number().over(w).alias("cent_id"), F.col(vec_col).alias("cvec"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """REAL coarse quantizer for IVF: Lloyd's k-means with deterministic
    seeding (first-k by id) and a fixed iteration count — fully
    DataFrame-expressed, so the oracle gate replays the identical
    training.  Each iteration: broadcast-assign every vector to its
    nearest centroid (``ivf_assign``) → per-cell per-dimension means.
    Means go through exact DECIMAL sums divided as doubles and rounded,
    making the floating-point result partition-order independent — the
    property that keeps k-means itself value-hash verifiable.

    At 100 TB: train on a sample (``corpus.sample(...)``) — the plan is
    identical; ``iters`` is a fixed hyperparameter, not a convergence
    loop, so the lineage stays bounded without checkpoints."""
    cents = seeded_centroids(corpus, n_centroids, id_col, vec_col)
    mean_cols = [
        F.round(
            F.sum(
                F.element_at(F.col(vec_col), i + 1)
                .cast("double")
                .cast("decimal(18,6)")
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias(f"m{i}")
        for i in range(dim)
    ]
    spark = corpus.sparkSession
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        cents = (
            assigned.groupBy("cent_id")
            .agg(*mean_cols)
            .select(
                "cent_id",
                F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("cvec"),
            )
        )
        # materialize the k×dim centroid table between iterations (tiny:
        # k rows — this is the standard cluster practice too).  Without
        # it, iteration N+1's logical plan embeds iteration N's ENTIRE
        # subplan, and the final search query embeds the whole training
        # lineage — Catalyst re-optimizes an exponentially nested tree
        # and the corpus is re-scanned once per nesting level.
        cents = spark.createDataFrame(
            cents.collect(), schema="cent_id bigint, cvec array<double>"
        )
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (argmin L2, ties on
    cent_id).  Centroids are broadcast, so the K-way fan-out is map-side;
    the single shuffle is the groupBy on vector id.  This is the IVF
    index-build: at 100 TB the result is written bucketed by cent_id so
    searches prune to single partitions."""
    dist = F.round(l2sq_expr(F.col(vec_col), F.col("cvec")), 6)
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(
            F.min(F.struct(dist.alias("d"), F.col("cent_id").alias("cent_id")))
            .getField("cent_id")
            .alias("cent_id"),
            F.first(vec_col).alias(vec_col),
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    query_filter: Column,
    k: int = 3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "seeded",
    kmeans_iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus, then search only the
    query's own centroid cell (nprobe=1; multi-probe = union of the
    next-nearest cells).  Queries are corpus rows selected by
    ``query_filter``.  ``quantizer='kmeans'`` trains the real Lloyd
    quantizer (:func:`kmeans_centroids`); 'seeded' keeps the
    deterministic first-k baseline."""
    if quantizer == "kmeans":
        cents = kmeans_centroids(
            corpus, n_centroids, kmeans_iters, id_col, vec_col, dim
        )
    else:
        cents = seeded_centroids(corpus, n_centroids, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    q = assigned.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        "cent_id",
    )
    scored = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(q), "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col(vec_col)), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's sign-LSH bucket,
    then exact cosine within the bucket.  Recall < 1 by construction; at
    scale this is the first stage of an IVF-style search (multi-probe =
    union of neighboring buckets)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

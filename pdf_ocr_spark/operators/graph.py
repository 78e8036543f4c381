"""Graph operators over the crawl link graph.

PageRank as pure DataFrame ops with a FIXED iteration count — like
``similarity.kmeans_centroids``, every iteration routes floating-point
mass through exact DECIMAL sums and rounds the result, so the values are
partition-order independent and the whole computation is value-hash
verifiable against an unrolled SQL oracle.

Scale notes: each iteration is one (edges ⋈ ranks ⋈ degrees) join and
one groupBy on the destination — all partial-agg friendly; at web scale
edges are pre-bucketed by src so the join side co-locates.  Dangling
nodes contribute no mass (their rank leaks, the standard simplified
formulation) — documented, identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    prec: int = 10,
) -> DataFrame:
    """PageRank over (src, dst) edges → (node, pr).

    pr₀ = 1/N; prᵢ₊₁(v) = round(d · Σ_{u→v} prᵢ(u)/deg(u) + (1−d)/N).
    One driver-side count (N) — the only scalar the algorithm needs."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pr = nodes.withColumn("pr", F.round(F.lit(1.0 / n_nodes), prec))
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
        )
        mass = contrib.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(28,14)")).cast("double").alias("mass")
        )
        pr = nodes.join(mass, "node", "left").select(
            "node",
            F.round(
                F.coalesce(F.col("mass"), F.lit(0.0)) * damping + F.lit(base),
                prec,
            ).alias("pr"),
        )
    return pr

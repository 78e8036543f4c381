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
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
    )
    # norms are computed ONCE per row on each side of the join (a Project
    # below the join boundary — Catalyst does not inline it across), so
    # each of the N×Q pairs only pays the dot product, not 2 norms.
    # Same float ops in the same order as cosine_expr → bit-identical.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qv"), F.col("cv"))
                / (F.col("qnorm") * F.col("cnorm")),
                4,
            ).alias("cosine"),
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
    # the only no-partition window in the engine — it runs AFTER
    # .limit(k): k rows total (TakeOrdered feeds it), never the corpus
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
    cents = _collect_centroids(seeded_centroids(corpus, n_centroids, id_col, vec_col))
    spark = corpus.sparkSession
    for _ in range(iters):
        # One Lloyd step as ONE compact plan: map-side argmin assign →
        # posexplode to (cent_id, dim_idx, value) → a SINGLE decimal-mean
        # aggregate.  Decimal sums are exact → partition-order
        # independent, and grouping by (cent_id, dim_idx) instead of 64
        # per-dimension agg columns keeps the expression tree ~64×
        # smaller — the wide-agg form spent seconds per iteration in
        # Catalyst/codegen before a single row was touched.  Centroids
        # live as driver lists between iterations (k×dim — tiny at any
        # corpus scale; this is the standard cluster practice too).
        assigned = corpus.withColumn(
            "cent_id", _assign_col(F.col(vec_col), cents)
        )
        stats = (
            assigned.select(
                "cent_id", F.posexplode(F.col(vec_col)).alias("dim_idx", "v")
            )
            .groupBy("cent_id", "dim_idx")
            .agg(
                F.round(
                    F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)),
                    4,
                ).alias("m")
            )
            .collect()
        )
        by_cell: dict = {}
        for r in stats:
            by_cell.setdefault(int(r["cent_id"]), {})[int(r["dim_idx"])] = float(
                r["m"]
            )
        cents = [
            (cid, [dims[i] for i in range(dim)])
            for cid, dims in sorted(by_cell.items())
        ]
    return spark.createDataFrame(
        [(cid, cv) for cid, cv in cents], schema="cent_id bigint, cvec array<double>"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (argmin L2, ties on
    cent_id) — as a PURE MAP-SIDE PROJECTION, zero shuffle.

    The centroid table is k×dim — driver-scale at any corpus size — so
    instead of crossJoin(×k row expansion) + groupBy(full corpus
    shuffle), we collect it and unroll the argmin into one codegen'd
    expression per row: array_min over (round₆ L2², cent_id) structs,
    which orders by distance then cent_id exactly like the old
    min(struct(...)) aggregate.  This is the IVF index-build: at 100 TB
    the result is written bucketed by cent_id so searches prune to
    single partitions, and the assignment itself never exchanges."""
    rows = _collect_centroids(centroids)
    return corpus.withColumn("cent_id", _assign_col(F.col(vec_col), rows))


def _collect_centroids(centroids: DataFrame) -> list:
    """Pull the k×dim centroid table to the driver as [(cent_id, [floats])],
    sorted by cent_id.  Always driver-scale regardless of corpus size."""
    return sorted(
        (int(r["cent_id"]), list(r["cvec"]))
        for r in centroids.select("cent_id", "cvec").collect()
    )


def _dist_structs(vec: Column, cent_rows: list) -> Column:
    """(round₆ L2 distance, cent_id) structs against literal centroids
    — ONE definition of nearness shared by the argmin assign and the
    multi-probe slice, so the tie-break contract cannot desynchronize.

    The k×dim centroid table enters the plan as ONE parsed SQL literal
    (``expr("array(array(...),...)")``) iterated by a single zip_with
    lambda — not k per-centroid expression trees: building the tree
    through py4j column-by-column cost seconds of driver time per
    assign at k=8, dim=64 (measured; the data work itself is
    milliseconds).  repr() literals round-trip doubles exactly, so the
    distances are bit-identical to the per-centroid form."""
    cents = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) for x in cv) + ")"
            for _, cv in cent_rows
        )
        + ")"
    )
    ids = F.expr(
        "array(" + ",".join(f"{int(cid)}L" for cid, _ in cent_rows) + ")"
    )
    return F.zip_with(
        cents,
        ids,
        lambda cv, cid: F.struct(
            F.round(l2sq_expr(vec, cv), 6).alias("d"), cid.alias("cent_id")
        ),
    )


def _assign_col(vec: Column, cent_rows: list) -> Column:
    """The argmin-L2 cell id: array_min over the shared distance
    structs — ordered by distance then cent_id, exactly the old
    min(struct(...)) aggregate's tie-break."""
    return F.array_min(_dist_structs(vec, cent_rows)).getField("cent_id")


def _probe_cells_col(vec: Column, cent_rows: list, nprobe: int) -> Column:
    """The ``nprobe`` nearest cell ids, nearest first — the multi-probe
    generalization of :func:`_assign_col` over the same structs."""
    return F.transform(
        F.slice(F.array_sort(_dist_structs(vec, cent_rows)), 1, nprobe),
        lambda s: s.getField("cent_id"),
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
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus, then search the
    query's ``nprobe`` nearest centroid cells (nprobe=1 is the fastest/
    lowest-recall point; each extra probe widens the candidate set —
    the standard IVF recall lever, visible in ``sim_recall``).  Queries
    are corpus rows selected by ``query_filter``.  ``quantizer=
    'kmeans'`` trains the real Lloyd quantizer
    (:func:`kmeans_centroids`); 'seeded' keeps the deterministic
    first-k baseline."""
    if quantizer == "kmeans":
        cents = kmeans_centroids(
            corpus, n_centroids, kmeans_iters, id_col, vec_col, dim
        )
    else:
        cents = seeded_centroids(corpus, n_centroids, id_col, vec_col)
    # centroids collected ONCE and shared by both sides: a second
    # collect would re-execute the (kmeans-trained) centroid plan —
    # i.e. re-run Lloyd training — per collect.
    cent_rows = _collect_centroids(cents)
    assigned = corpus.withColumn(
        "cent_id", _assign_col(F.col(vec_col), cent_rows)
    )
    # assignment is per-row, so filter-then-assign ≡ assign-then-filter:
    # the query side only pays the argmin over its own (tiny) slice
    # instead of re-running the full-corpus assign a second time.  A
    # query probes nprobe DISTINCT cells and each corpus vector lives in
    # exactly one, so the probe explode never duplicates a pair.
    probes = _probe_cells_col(F.col(vec_col), cent_rows, nprobe)
    q = corpus.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
        F.explode(probes).alias("cent_id"),
    )
    # per-row norms below the join boundary (see cosine_topk_bruteforce)
    scored = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm_expr(F.col(vec_col)).alias("cnorm"),
            "cent_id",
        )
        .join(F.broadcast(q), "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qv"), F.col("cv"))
                / (F.col("qnorm") * F.col("cnorm")),
                4,
            ).alias("cosine"),
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
        norm_expr(F.col(vec_col)).alias("cnorm"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    # per-row norms below the join boundary (see cosine_topk_bruteforce)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qv"), F.col("cv"))
                / (F.col("qnorm") * F.col("cnorm")),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def bitext_margin_pairs(
    x: DataFrame,
    y: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the
    CCMatrix/CCAligned parallel-corpus mining step): score every
    cross-side candidate pair by cosine normalized against both ends'
    local neighborhood densities,

        margin(x, y) = cos(x, y) / ((avgₖNN(x) + avgₖNN(y)) / 2),

    keep pairs that are MUTUAL best-by-margin and above ``threshold``.
    The margin cancels hubness: a vector whose neighborhood is dense
    everywhere (high avg-kNN cosine) needs a proportionally higher raw
    cosine to count as a translation pair.

    ``bits=None`` scores all cross pairs (exactness baseline —
    quadratic, guarded by ``max_rows``).  ``bits=b`` restricts
    candidates to shared sign-LSH buckets — the ANN mining used at
    CCMatrix scale (recall < 1; the margin denominators then average
    over the candidate neighborhood, as in production FAISS mining).

    Determinism: cosines round to 6 decimals, denominators average via
    exact DECIMAL sums, margins round to 4, every rank ties on id —
    bit-stable across engines and partitionings.

    Plan at 100 TB: with ``bits`` set the candidate join is a bucket
    equi-join (Σ O(bucket²), AQE skew-split); the two avg-kNN windows
    partition per vector id — never global; the mutual-best check is
    two more per-id windows over the same scored set."""
    from pdf_ocr_spark.operators.dedup import _guard_bounded

    xs = x.select(
        F.col(id_col).alias("x_id"),
        F.col(vec_col).alias("xv"),
        norm_expr(F.col(vec_col)).alias("xnorm"),
    )
    ys = y.select(
        F.col(id_col).alias("y_id"),
        F.col(vec_col).alias("yv"),
        norm_expr(F.col(vec_col)).alias("ynorm"),
    )
    if bits is None:
        _guard_bounded(x, max_rows, "bitext_margin_pairs(x, y, bits=8)")
        _guard_bounded(y, max_rows, "bitext_margin_pairs(x, y, bits=8)")
        pairs = xs.crossJoin(ys)
    else:
        xs = xs.withColumn("bucket", sign_bucket_expr(F.col("xv"), bits))
        ys = ys.withColumn("bucket", sign_bucket_expr(F.col("yv"), bits))
        pairs = xs.join(ys, "bucket")
    scored = pairs.select(
        "x_id",
        "y_id",
        F.round(
            dot_expr(F.col("xv"), F.col("yv")) / (F.col("xnorm") * F.col("ynorm")), 6
        ).alias("c6"),
    )
    wx = Window.partitionBy("x_id").orderBy(F.desc("c6"), F.asc("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.desc("c6"), F.asc("x_id"))
    ranked = scored.select(
        "x_id",
        "y_id",
        "c6",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    dx = (
        ranked.filter(F.col("rx") <= k)
        .groupBy("x_id")
        .agg(
            (
                F.sum(F.col("c6").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("dx")
        )
    )
    dy = (
        ranked.filter(F.col("ry") <= k)
        .groupBy("y_id")
        .agg(
            (
                F.sum(F.col("c6").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("dy")
        )
    )
    margins = (
        scored.join(dx, "x_id")
        .join(dy, "y_id")
        .select(
            "x_id",
            "y_id",
            "c6",
            F.round(F.col("c6") / ((F.col("dx") + F.col("dy")) / 2), 4).alias(
                "margin"
            ),
        )
    )
    mx = Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    my = Window.partitionBy("y_id").orderBy(F.desc("margin"), F.asc("x_id"))
    return (
        margins.withColumn("bx", F.row_number().over(mx))
        .withColumn("by", F.row_number().over(my))
        .filter((F.col("bx") == 1) & (F.col("by") == 1))
        .filter(F.col("margin") >= threshold)
        .select(
            "x_id", "y_id", F.round(F.col("c6"), 4).alias("cosine"), "margin"
        )
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011 — the
    compressed-index scale path beyond IVF): the vector space splits
    into ``m`` contiguous subspaces of dim/m dimensions and each gets
    its own Lloyd k-means codebook of ``ksub`` centroids, trained with
    the SAME deterministic seeded-init + fixed-iteration protocol as
    :func:`kmeans_centroids` (exact-decimal per-dimension means), so
    the full trained model stays value-hash verifiable by the DuckDB
    oracle.  Output: (sub_id, cent_id, cvec) — m×ksub rows, driver/
    broadcast scale.

    All m subspaces train FUSED: each Lloyd iteration is ONE corpus
    pass — every vector's m codes are computed in a single projection
    (literal centroid arrays, the ivf_assign discipline), the embedding
    posexplodes once, and a single (sub, cent, dim) decimal-mean
    groupBy updates every codebook together.  At 100 TB that is iters
    corpus passes total instead of m·iters (train on a sample — the
    plan is identical); per-cell math is bit-identical to running
    kmeans_centroids per slice, which is what the DuckDB oracle
    replays."""
    dsub = dim // m
    seed = sorted(
        (int(r[id_col]), list(r[vec_col]))
        for r in corpus.orderBy(id_col).limit(ksub).select(id_col, vec_col).collect()
    )
    cents = {
        s: [
            (i + 1, [float(x) for x in vec[s * dsub:(s + 1) * dsub]])
            for i, (_, vec) in enumerate(seed)
        ]
        for s in range(m)
    }
    for _ in range(iters):
        codes = F.array(*[
            _assign_col(
                F.slice(F.col(vec_col), s * dsub + 1, dsub), cents[s]
            ).cast("int")
            for s in range(m)
        ])
        # two selects: resolving the HOF-struct assign in the same
        # projection as a generator (posexplode) trips a Spark analyzer
        # quirk that drops the struct-field aliases inside the lambda
        stats = (
            corpus.select(codes.alias("_codes"), F.col(vec_col).alias("_v"))
            .select("_codes", F.posexplode("_v").alias("di", "v"))
            .select(
                (F.col("di") / dsub).cast("int").alias("sub_id"),
                F.element_at(
                    "_codes", (F.col("di") / dsub).cast("int") + 1
                ).alias("cent_id"),
                "di",
                "v",
            )
            .groupBy("sub_id", "cent_id", "di")
            .agg(
                F.round(
                    F.sum(
                        F.col("v").cast("double").cast("decimal(18,6)")
                    ).cast("double")
                    / F.count(F.lit(1)),
                    4,
                ).alias("mval")
            )
            .collect()
        )
        by_cell: dict = {}
        for r in stats:
            by_cell.setdefault(
                (int(r["sub_id"]), int(r["cent_id"])), {}
            )[int(r["di"])] = float(r["mval"])
        cents = {
            s: [
                (cid, [dims[s * dsub + i] for i in range(dsub)])
                for (sid, cid), dims in sorted(by_cell.items())
                if sid == s
            ]
            for s in range(m)
        }
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(s, cid, cv) for s in range(m) for cid, cv in cents[s]],
        schema="sub_id int, cent_id bigint, cvec array<double>",
    )


def _collect_codebooks(codebooks: DataFrame) -> list:
    """[(sub_id, cent_id, [floats])] sorted — m×ksub rows, driver-scale."""
    return sorted(
        (int(r["sub_id"]), int(r["cent_id"]), list(r["cvec"]))
        for r in codebooks.select("sub_id", "cent_id", "cvec").collect()
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """PQ encoding: every vector compresses to ``m`` small codes — the
    per-subspace argmin against the broadcast codebooks, as a PURE
    MAP-SIDE PROJECTION (the ivf_assign discipline: literal centroid
    arrays, one codegen'd array_min per subspace, zero shuffle, zero
    Python).  Output: (id, codes array<int>) — at 100 TB this is the
    8-32x index compression that lets the ANN index live in memory."""
    rows = _collect_codebooks(codebooks)
    m = max(s for s, _, _ in rows) + 1
    dsub = dim // m
    code_cols = []
    for s in range(m):
        cent_rows = [(cid, cv) for (sid, cid, cv) in rows if sid == s]
        code_cols.append(
            _assign_col(
                F.slice(F.col(vec_col), s * dsub + 1, dsub), cent_rows
            ).cast("int")
        )
    return corpus.select(id_col, F.array(*code_cols).alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    codebooks: DataFrame,
    query_filter: Column,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-coded corpus: the
    query keeps its exact vector, every coded vector's distance is the
    sum of per-subspace table lookups — the classic PQ search plan made
    relational:

      1. the distance TABLE is queries × codebooks (Q × m × ksub rows —
         broadcast-shaped for any sane query batch), each entry the
         round-6 squared L2 between the query's subspace slice and a
         codebook centroid, cast DECIMAL(18,6) so the m-term sums are
         exact and order-independent;
      2. the coded corpus posexplodes to (vec, sub, code) and
         equi-joins the BROADCAST table on (sub, code) — the lookup;
      3. one map-side-combined groupBy sums the m partial distances
         per (query, vec); row_number under (adc ASC, neighbor ASC)
         takes k.

    Output: (query_id, neighbor_id, adc_dist, rank) — adc_dist is the
    QUANTIZED distance (PQ's accuracy/size trade), not the exact one;
    ``sim_recall``-style gates measure what that trade costs."""
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col, dim=dim)
    rows = _collect_codebooks(codebooks)
    m = max(s for s, _, _ in rows) + 1
    dsub = dim // m
    q = corpus.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    dtab = (
        q.crossJoin(F.broadcast(codebooks))
        .select(
            "query_id",
            "sub_id",
            "cent_id",
            F.round(
                l2sq_expr(
                    F.slice(
                        F.col("qv"), F.col("sub_id") * dsub + 1, F.lit(dsub)
                    ),
                    F.col("cvec"),
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("d"),
        )
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub_id", "code"),
    )
    scored = (
        exploded.join(
            F.broadcast(dtab),
            (exploded["sub_id"] == dtab["sub_id"])
            & (exploded["code"] == dtab["cent_id"]),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("adc").cast("double").alias("adc_dist"),
            "rank",
        )
    )

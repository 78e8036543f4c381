"""Mergeable sketches, relationally: HyperLogLog distinct counting and
Count-Min frequency estimation — the bounded-memory structures that
replace exact groupBys when 100 TB won't fit one (HLL is what
`approx_count_distinct` runs inside Spark; Common Crawl's host ranking
runs HLL registers along edges as HyperBall).  Implemented HERE as
plain DataFrame ops so the sketch state is an inspectable TABLE:

  * every hash derives from md5 via conv(hex,16,10) — JVM-side codegen
    AND bit-for-bit reproducible in DuckDB, the dedup-module protocol
  * register widths are chosen so every arithmetic step is EXACT:
    48-bit hashes (< 2^53, double-safe), rho from length(bin(w)) —
    integer string ops, no float log2 — and the HLL harmonic sum adds
    ≤ m exact powers of two spanning < 53 bits, so even the double
    accumulation is order-independent and bit-reproducible
  * sketch state per key is ≤ m rows (HLL) / d·w rows (CMS) NO MATTER
    the input cardinality — that bound is what makes the state
    broadcastable and mergeable across partitions/snapshots (merge =
    groupBy max / groupBy sum, both partial-agg friendly)

Estimates are deliberately IMPRECISE — every query that ships one also
ships the exact value, so the error is a visible dashboard column, not
a hidden assumption (the sim_recall / dedup_recall protocol).

Reference pipeline has no sketch surface (five eager OCR scripts);
this extends the crawl-analytics layer like operators/graph.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48-bit hash: 12 hex chars.  bucket = low b bits; w = remaining
# (48 - b) bits; rho = leading-zero count of w within its fixed width
# + 1 = W - bit_length(w) + 1, bit_length via length(bin(w)).
_HASH_HEX = 12
_HASH_BITS = 4 * _HASH_HEX

# Flajolet et al. 2007 alpha constants for small m
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def lc_table(m: int):
    """Linear-counting lookup m·ln(m/V) for V = 1..m−1, precomputed in
    ONE canonical libm (CPython's math.log) and shipped to BOTH engines
    as literals — JVM Math.log and DuckDB ln differ by 1 ulp on some
    inputs, which crosses 4dp rounding boundaries; a 63-entry literal
    table removes the transcendental from the plan entirely."""
    import math

    return [m * math.log(m / v) for v in range(1, m)]


def _h48(col: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(":" + salt))), 1, _HASH_HEX),
        16,
        10,
    ).cast("long")


def hll_registers(
    df: DataFrame,
    key_cols,
    item_col: str,
    b: int = 4,
    salt: str = "hll",
) -> DataFrame:
    """Per-key HLL register table: (key…, bucket, rho) with rho = the
    max leading-1 position seen in any item hashing to that bucket.
    ≤ 2^b rows per key regardless of item cardinality; merging two
    sketches (cross-partition, cross-snapshot) is groupBy max."""
    m = 1 << b
    wbits = _HASH_BITS - b
    h = _h48(F.col(item_col), salt)
    # h >> b as explicit floor — Spark's cast(double as long) truncates
    # but DuckDB's CAST rounds, so the oracle mirrors floor()/intdiv
    w = F.floor(h / m).cast("long")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (
        df.select(*keys, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, key_cols, b: int = 4) -> DataFrame:
    """Registers → per-key cardinality estimate (key…, est).

    Raw = α_m·m² / Σ_j 2^(−M_j) (absent buckets contribute 2^0); the
    small-range linear-counting correction (raw ≤ 2.5m and zero
    registers exist) is m·ln(m/V) per the published algorithm — drawn
    from the precomputed :func:`lc_table` literals so no engine libm
    participates.  Both branches round to 4dp; every remaining step is
    exact arithmetic, so estimates value-hash against the oracle."""
    m = 1 << b
    alpha = _ALPHA[m]
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    agg = registers.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    denom = F.col("_s") + (F.lit(m) - F.col("_nb"))  # absent buckets: 2^0
    raw = F.lit(alpha * m * m) / denom
    v = F.lit(m) - F.col("_nb")  # zero registers (rho never < 1 when seen)
    lc = F.element_at(F.array(*[F.lit(x) for x in lc_table(m)]), v.cast("int"))
    est = F.when((raw <= 2.5 * m) & (v > 0), lc).otherwise(raw)
    return agg.select(*keys, F.round(est, 4).alias("est"))


def cms_counts(
    df: DataFrame,
    item_col: str,
    weight_col: str = None,
    d: int = 3,
    w: int = 64,
) -> DataFrame:
    """Count-Min sketch as a (row, pos, cnt) table: d salted hash rows
    × w counters; build = ONE groupBy over d fanned-out rows (map-side
    combined), merge across shards = groupBy sum.  d·w rows total —
    broadcastable at any input size."""
    weight = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                (_h48(F.col(item_col), f"cms{i}") % w).alias("pos"),
            )
            for i in range(d)
        ])
    ).alias("rp")
    return (
        df.select(rows, weight.alias("_w"))
        .select(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"), "_w")
        .groupBy("row", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    d: int = 3,
    w: int = 64,
) -> DataFrame:
    """Point-query the sketch for each item row: est = min over the d
    rows of the addressed counter — never an undercount (the CMS
    guarantee); join is d broadcast lookups against the ≤ d·w-row
    sketch."""
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    (_h48(F.col(item_col), f"cms{i}") % w).alias("pos"),
                )
                for i in range(d)
            ])
        ).alias("rp"),
    ).select("item", F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
    return (
        probes.join(F.broadcast(sketch), ["row", "pos"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


def hyperball_harmonic(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    radius: int = 3,
    b: int = 6,
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", 2013): harmonic centrality ESTIMATED
    by HyperLogLog counters propagated along edges — the algorithm
    Common Crawl actually runs for its host rankings, and the scale
    path `graph.harmonic_centrality`'s docstring promises.

    Each node holds one HLL register set; round r merges every
    in-neighbour's round-(r−1) set into the node's own (groupBy max —
    the HLL merge), so after r rounds the set sketches ball_r(v) =
    {u : d(u→v) ≤ r} ∪ {v}.  The harmonic sum accumulates the ball
    GROWTH per round: H ≈ Σ_r (|ball_r| − |ball_{r−1}|)/r.

    State per node is 2^b registers NO MATTER the graph — at 10⁸ hosts
    × b=6 that's a few GB total, where the exact min-plus pair table
    (Σ ball sizes) is unbounded; per round the work is ONE edge join +
    ONE groupBy max + ONE estimate aggregate, all partial-agg friendly.

    Output: (node, hb_harmonic, hb_reached) — the estimates.  Pair
    with `harmonic_centrality` for the error dashboard (estimates are
    deliberately imprecise; ship the exact value next to them where
    the graph allows it, the sim_recall protocol)."""
    e1 = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()  # referenced by every round + the register init
    )
    nodes = (
        e1.select(F.col("src").alias("node"))
        .unionByName(e1.select(F.col("dst").alias("node")))
        .distinct()
    )
    try:
        reg = hll_registers(
            nodes.select("node", F.col("node").alias("item")), "node", "item", b
        ).localCheckpoint()
        est = hll_estimate(reg, "node", b).withColumnRenamed("est", "e0")
        for r in range(1, radius + 1):
            prop = reg.join(
                e1.withColumnRenamed("src", "node"), "node"
            ).select(F.col("dst").alias("node"), "bucket", "rho")
            # localCheckpoint per round: the est chain references EVERY
            # round's registers, and without lineage truncation round r
            # re-plans rounds 1..r-1 inside each estimate (the BPE-trainer
            # per-round protocol; state is ≤ |V|·2^b rows)
            reg = (
                reg.unionByName(prop)
                .groupBy("node", "bucket")
                .agg(F.max("rho").alias("rho"))
                .localCheckpoint()
            )
            est = est.join(
                hll_estimate(reg, "node", b).withColumnRenamed("est", f"e{r}"),
                "node",
            )
    finally:
        # every round's registers are EAGERLY checkpointed above, so by
        # here nothing in the returned plan reads e1 — release it instead
        # of leaking one edge cache per call into a long-lived driver
        e1.unpersist(blocking=False)
    # 1/r as 10dp literals, NOT a division — and EXPLICIT half-up
    # rounding (floor(x·10⁴+0.5)/10⁴): est differences are exact 4dp
    # decimals, so Σ terms/r lands exactly on 4dp half-boundaries,
    # where Spark's round() (BigDecimal over the SHORTEST string repr)
    # and DuckDB's (binary value) disagree; floor over the identical
    # IEEE products is deterministic in both engines for ANY input
    growth = sum(
        (
            F.lit(round(1.0 / r, 10)) * (F.col(f"e{r}") - F.col(f"e{r - 1}"))
            for r in range(1, radius + 1)
        ),
        F.lit(0.0),
    )
    return est.select(
        "node",
        (F.floor(growth * 10000 + 0.5) / 10000).alias("hb_harmonic"),
        (
            F.floor((F.col(f"e{radius}") - F.col("e0")) * 10000 + 0.5) / 10000
        ).alias("hb_reached"),
    )


def kmv_bottom_k(
    df: DataFrame,
    key_cols,
    item_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """KMV / bottom-k sketch (Bar-Yossef et al. 2002; the theta-sketch
    family): per key, the k SMALLEST 48-bit item hashes — the sketch
    that, unlike HLL, supports SET OPERATIONS (union = bottom-k of the
    merged sketches; intersection membership is testable hash by hash),
    which is what crawl-overlap questions need.

    Output: (key…, h, rn) with rn = 1..k in hash order.  One distinct
    + one per-key sort-window (state k rows per key downstream); at
    100 TB the window is the textbook top-k shuffle — map-side
    partial top-k via AQE, never a global sort."""
    from pyspark.sql.window import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    hashed = df.select(
        *keys, _h48(F.col(item_col), salt).alias("h")
    ).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_estimate(sketch: DataFrame, key_cols, k: int = 128) -> DataFrame:
    """Bottom-k sketch → per-key distinct-count estimate: when the key
    holds fewer than k hashes the sketch IS the set (exact count);
    otherwise (k−1) · 2^48 / h_k — the classic KMV estimator over the
    k-th minimum.  Division of exact integers; round 4dp."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
    )
    # greatest(h_k, 1): a 48-bit md5 prefix of exactly 0 has
    # probability 2^-48, but under Spark 4's default ANSI mode that
    # tail case is a DIVIDE_BY_ZERO job failure, not a bad estimate
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << _HASH_BITS))
        / F.greatest(F.col("_hk"), F.lit(1).cast("long"))
    )
    return agg.select(*keys, F.round(est, 4).alias("est"))


def kmv_jaccard(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 128
) -> DataFrame:
    """Jaccard similarity of two sets from their bottom-k sketches
    (single-key sketches: columns (h, rn)): take the union's bottom-k
    (the union sketch — a uniform sample of A ∪ B), and count how many
    of those hashes appear in BOTH input sketches.  J ≈ matched / |U|.
    Returns one row (n_union_sample, n_matched, jaccard_est).

    This is the crawl-to-crawl overlap dashboard at sketch cost: the
    full url sets never co-locate — only two k-row sketches meet."""
    a = sketch_a.select(F.col("h").alias("h")).withColumn("_a", F.lit(1))
    b = sketch_b.select(F.col("h").alias("h")).withColumn("_b", F.lit(1))
    u = (
        a.select("h")
        .unionByName(b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    marked = (
        u.join(a, "h", "left")
        .join(b, "h", "left")
        .agg(
            F.count(F.lit(1)).alias("n_union_sample"),
            F.sum(
                (F.col("_a").isNotNull() & F.col("_b").isNotNull()).cast("int")
            ).alias("n_matched"),
        )
    )
    return marked.select(
        "n_union_sample",
        "n_matched",
        # empty sketches -> 0-row union sample: emit NULL, not an
        # ANSI DIVIDE_BY_ZERO (visible absence beats a crashed job)
        F.when(
            F.col("n_union_sample") > 0,
            F.round(F.col("n_matched") / F.col("n_union_sample"), 4),
        ).alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# Mergeable log-scaled histogram → quantile estimation
# ---------------------------------------------------------------------------

def log_histogram(
    df: DataFrame,
    value_col: str,
    sub_bits: int = 2,
    shard_col: Column = None,
) -> DataFrame:
    """Mergeable quantile sketch: a log2-scaled histogram with
    2^sub_bits sub-bins per octave → (bin, cnt).

    bin = floor(log2 v)·S + (floor(v/2^floor(log2 v) · S) − S) with
    S = 2^sub_bits — every step is exact IEEE arithmetic (log2 is
    exact on powers of two, division by 2^b is exact, v/2^b ∈ [1,2)),
    so the sketch value-hashes against a SQL replay.  Relative bin
    width is 1/S, bounding quantile error to ~2^-sub_bits·q.

    This is the 100-TB quantile path: constant-size state (≤ S·64
    bins for long values), built with ONE map-side-combinable groupBy
    and merged across partitions/shards/snapshots by plain SUM —
    unlike exact percentiles, which need a global sort.  Pass
    ``shard_col`` to materialize the per-shard sketches first (the
    merge is then a second sum — provably identical to the direct
    build, which the oracle exercises)."""
    s = 1 << sub_bits
    v = F.greatest(F.lit(1).cast("long"), F.col(value_col).cast("long"))
    b = F.floor(F.log2(v)).cast("long")
    sub = (F.floor(v / F.pow(F.lit(2.0), b) * s) - s).cast("long")
    binid = (b * s + sub).alias("bin")
    if shard_col is not None:
        shards = (
            df.select(shard_col.alias("shard"), binid)
            .groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return shards.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    return df.select(binid).groupBy("bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles,
    sub_bits: int = 2,
) -> DataFrame:
    """Histogram → per-quantile estimates: (q, target_rank, est).

    target rank r = ceil(q·n); the estimate interpolates linearly
    inside the first bin whose cumulative count reaches r, between the
    bin's bounds lo = 2^b·(1+s/S) and hi = 2^b·(1+(s+1)/S).  Integer
    cumulative counts + one exact-rational interpolation, rounded to
    4dp — engine-exact.  The window runs over the BIN table (≤ a few
    hundred rows), never the data."""
    from pyspark.sql import Window

    s = 1 << sub_bits
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
    )
    total = cum.agg(F.max("cum").alias("n"))
    b = F.floor(F.col("bin") / s).cast("long")
    sub = F.col("bin") % s
    lo = F.pow(F.lit(2.0), b) * (1 + sub / F.lit(s))
    hi = F.pow(F.lit(2.0), b) * (1 + (sub + 1) / F.lit(s))
    rows = None
    for q in quantiles:
        r = F.ceil(F.lit(float(q)) * F.col("n")).cast("long")
        cand = (
            cum.crossJoin(F.broadcast(total))
            .filter(F.col("cum") >= r)
            .withColumn("_rank", r)
            .withColumn(
                "est",
                F.round(
                    lo
                    + (hi - lo)
                    * (F.col("_rank") - (F.col("cum") - F.col("cnt")))
                    / F.col("cnt"),
                    4,
                ),
            )
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(float(q)).alias("q"),
                F.col("_rank").alias("target_rank"),
                "est",
            )
        )
        rows = cand if rows is None else rows.unionByName(cand)
    return rows

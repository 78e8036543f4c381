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


def anchor_text_profile(
    edges: DataFrame,
    src_col: str = "url",
    dst_col: str = "link",
    anchor_col: str = "anchor_text",
    nofollow_col: str = "nofollow",
    max_anchors: int = 8,
) -> DataFrame:
    """Per-target incoming-anchor profile — the link-graph description
    of a page that is independent of the page's own content (search
    ranking and crawl prioritization both use aggregated in-link anchor
    text; nofollow/ugc/sponsored links are excluded from the summary
    per their robots link-level semantics).

    Output per destination: ``n_inlinks`` (all), ``n_follow``
    (followed only), ``n_src_pages`` (distinct linking pages), and
    ``anchor_summary`` — the first ``max_anchors`` DISTINCT non-empty
    followed anchor texts in lexicographic order, '|'-joined
    (deterministic, bounded).

    Scale: the count aggregates are ONE map-side-combinable
    groupBy(dst).  The summary is state-bounded explicitly: distinct
    (dst, anchor) pairs first (a mega-indegree homepage dedups its
    millions of repeated 'Home' anchors map-side), then a per-dst
    row_number window keeps ``max_anchors`` rows BEFORE the final
    collect — no unbounded collect_set buffer anywhere."""
    from pyspark.sql.window import Window

    dst = F.col(dst_col)
    followed = ~F.col(nofollow_col)
    counts = edges.groupBy(dst.alias("dst")).agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.sum(followed.cast("long")).alias("n_follow"),
        F.countDistinct(src_col).alias("n_src_pages"),
    )
    per_anchor = (
        edges.filter(followed & (F.col(anchor_col) != ""))
        .select(dst.alias("dst"), F.col(anchor_col).alias("anchor"))
        .distinct()
    )
    w = Window.partitionBy("dst").orderBy("anchor")
    summary = (
        per_anchor.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_anchors)
        .groupBy("dst")
        .agg(
            F.array_join(F.array_sort(F.collect_list("anchor")), "|").alias(
                "anchor_summary"
            )
        )
    )
    return counts.join(summary, "dst", "left")


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    prec: int = 10,
) -> DataFrame:
    """HITS (Kleinberg): hub/authority scores over (src, dst) edges →
    (node, hub, auth) after a FIXED number of mutual-reinforcement
    iterations — the classic complement to PageRank for separating
    link directories (hubs) from linked-to content (authorities) when
    prioritizing a crawl.

    Each half-step sums the opposite score over the edges and
    L1-normalizes: auth(v) = Σ_{u→v} hub(u) / Σ auth-mass, then
    hub(u) = Σ_{u→v} auth(v) / Σ hub-mass.  All mass moves through
    exact DECIMAL sums; normalized scores round to ``prec`` — the same
    partition-order-independence contract as :func:`pagerank`, so the
    whole run value-hashes against an unrolled SQL oracle.

    Scale: per half-step, one (edges ⋈ scores) join + one groupBy —
    both partial-agg friendly; the normalizer reduces to ONE broadcast
    row (no driver collect anywhere).  ``iters`` is a fixed
    hyperparameter, so lineage stays bounded without checkpoints."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = None
    for _ in range(iters):
        am = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("hub").cast("decimal(28,14)")).alias("am"))
        )
        at = am.agg(F.sum("am").cast("double").alias("t"))
        auth = (
            nodes.join(am, "node", "left")
            .crossJoin(F.broadcast(at))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("am").cast("double"), F.lit(0.0)) / F.col("t"),
                    prec,
                ).alias("auth"),
            )
        )
        hm = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("auth").cast("decimal(28,14)")).alias("hm"))
        )
        ht = hm.agg(F.sum("hm").cast("double").alias("t"))
        hub = (
            nodes.join(hm, "node", "left")
            .crossJoin(F.broadcast(ht))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("hm").cast("double"), F.lit(0.0)) / F.col("t"),
                    prec,
                ).alias("hub"),
            )
        )
    return nodes.join(hub, "node").join(auth, "node").select("node", "hub", "auth")


# --------------------------------------------------------------------------
# Host-level webgraph rollup.  Common Crawl publishes its webgraph at host
# and domain granularity (the page-level graph is too large to ship); the
# reference pipeline stops at per-page link emission
# (pdf_ocr_with_boxes_v2.py has no graph stage), so this is part of the
# crawl-analytics surface the engine adds on top of extract_links.

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/:?#]+)"


def host_expr(url: "F.Column") -> "F.Column":
    """Lowercased hostname of an absolute URL ('' when unparseable) —
    one regexp, replayable verbatim in the DuckDB oracle (RE2 both
    sides): scheme dropped, userinfo dropped, port dropped."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def host_graph(
    edges: DataFrame, url_col: str = "url", link_col: str = "link"
) -> DataFrame:
    """Page-level link edges → host-level webgraph:
    (src_host, dst_host, n_links, n_nofollow, n_pages).

    Only web links participate (absolute http(s) targets plus
    root-relative paths, which resolve to the source host); mailto:,
    javascript:, fragment-only and other non-fetchable hrefs are
    dropped — the same scoping a crawl frontier applies.  n_pages is
    the distinct source-page count behind each host pair (an edge
    backed by many pages is structural; one backed by a single page is
    incidental).

    Plan at 100 TB: one filter + one groupBy on (src_host, dst_host) —
    map-side partial aggregation collapses the per-page fan-in before
    the shuffle, so traffic is bounded by distinct host pairs (~10^9),
    not edges (~10^12).  count(DISTINCT url) rewrites to a two-stage
    expand under AQE; hot host pairs (link farms) split via skew-join.
    """
    url, link = F.col(url_col), F.col(link_col)
    is_web = (
        F.lower(link).startswith("http://")
        | F.lower(link).startswith("https://")
        | link.startswith("/")
    )
    src_host = host_expr(url)
    dst_host = F.coalesce(
        F.nullif(host_expr(link), F.lit("")), src_host
    )
    return (
        edges.filter(is_web)
        .select(
            src_host.alias("src_host"),
            dst_host.alias("dst_host"),
            url.alias("_page"),
            F.col("nofollow"),
        )
        .filter(F.col("src_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(F.col("nofollow").cast("int")).alias("n_nofollow"),
            F.countDistinct("_page").alias("n_pages"),
        )
    )

"""Graph operator tests: PageRank semantics on a known tiny graph."""

from pdf_ocr_spark.operators.graph import pagerank


def test_pagerank_hub_dominates(spark):
    # star: everyone links to 'hub'; hub links to 'a'
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    pr = {r["node"]: r["pr"] for r in pagerank(edges, iters=5).collect()}
    assert set(pr) == {"a", "b", "c", "d", "hub"}
    assert pr["hub"] == max(pr.values())         # everyone votes for hub
    assert pr["a"] > pr["b"] == pr["c"] == pr["d"]  # hub's vote lifts a
    assert abs(sum(pr.values()) - 1.0) < 0.35    # leak bounded (dangling-free here)


def test_pagerank_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 23}") for i in range(200)],
        "src string, dst string",
    )
    a = {r["node"]: r["pr"] for r in pagerank(edges.repartition(2), iters=3).collect()}
    b = {r["node"]: r["pr"] for r in pagerank(edges.repartition(17), iters=3).collect()}
    assert a == b  # decimal-summed mass: partition-order independent


def test_anchor_text_profile_bounded_summary(spark):
    """Anchor profile: nofollow excluded, duplicates collapsed, summary
    capped at max_anchors in lexicographic order, counts exact."""
    from pdf_ocr_spark.operators.graph import anchor_text_profile

    rows = (
        [("p1", "t", f"anchor{i:02d}", False) for i in range(12)]  # cap test
        + [("p2", "t", "anchor00", False)]          # dup anchor, 2nd src
        + [("p3", "t", "spammy", True)]             # nofollow: counted, not summarized
        + [("p1", "u", "", False)]                  # empty anchor: counted only
    )
    edges = spark.createDataFrame(
        rows, "url string, link string, anchor_text string, nofollow boolean"
    )
    out = anchor_text_profile(edges, max_anchors=3)
    got = {r["dst"]: r for r in out.collect()}
    t = got["t"]
    assert (t["n_inlinks"], t["n_follow"], t["n_src_pages"]) == (14, 13, 3)
    assert t["anchor_summary"] == "anchor00|anchor01|anchor02"
    u = got["u"]
    assert (u["n_inlinks"], u["n_follow"], u["anchor_summary"]) == (1, 1, None)

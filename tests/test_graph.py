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

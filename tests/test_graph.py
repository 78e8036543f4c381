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


def test_hits_star_graph_semantics(spark):
    """Pinned HITS on a star: the directory page linking to all leaves is
    the top hub; the page every node links to is the top authority; L1
    normalization keeps each score vector summing to 1."""
    from pdf_ocr_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [
            ("dir", "a"), ("dir", "b"), ("dir", "c"), ("dir", "pop"),
            ("a", "pop"), ("b", "pop"),
        ],
        "src string, dst string",
    )
    got = {r.node: (r.hub, r.auth) for r in hits(edges, iters=2).collect()}
    hubs = {n: h for n, (h, _) in got.items()}
    auths = {n: a for n, (_, a) in got.items()}
    assert max(hubs, key=hubs.get) == "dir"
    assert max(auths, key=auths.get) == "pop"
    assert abs(sum(hubs.values()) - 1.0) < 1e-6
    assert abs(sum(auths.values()) - 1.0) < 1e-6
    # leaves that link nowhere are zero hubs; never-linked-to pages zero auth
    assert hubs["c"] == 0.0 and hubs["pop"] == 0.0
    assert auths["dir"] == 0.0


def test_tfidf_keywords_pinned(spark):
    """TF-IDF: a corpus-wide word scores 0 (ln(N/N)); a df-1 word is cut
    by min_df; the doc-specific repeated word wins; rank ties on term."""
    import math

    from pdf_ocr_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common apple apple banana"),
            (2, "common apple zebra"),
            (3, "common banana"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.term): r for r in tfidf_keywords(docs, k=2, min_df=2).collect()}
    # N=3; df: common=3, apple=2, banana=2; zebra df=1 -> excluded
    assert (2, "zebra") not in rows
    assert rows[(1, "apple")].tfidf == round(2 * math.log(3 / 2), 4)
    assert rows[(1, "apple")].rank == 1
    # doc 1's 2nd keyword: banana (0.4055) beats common (0, cut at k=2)
    assert rows[(1, "banana")].rank == 2
    assert (1, "common") not in rows
    # doc 3 keeps common at rank 2: the corpus-wide term scores ln(3/3)=0
    assert rows[(3, "common")].tfidf == 0.0
    assert rows[(3, "common")].rank == 2


def test_host_graph_host_normalization_and_scoping(spark):
    from pdf_ocr_spark.operators.graph import host_graph

    edges = spark.createDataFrame(
        [
            # two pages on a.test linking cross-host + one relative
            ("https://a.test/p1", "https://B.test/x", False),
            ("https://a.test/p1", "/local", True),
            ("https://a.test/p2", "HTTPS://b.TEST:8080/y", False),
            # non-fetchable hrefs must drop out entirely
            ("https://a.test/p2", "mailto:x@a.test", False),
            ("https://a.test/p2", "javascript:void(0)", False),
            ("https://a.test/p2", "#frag", False),
            # userinfo is stripped from the target host
            ("http://c.test/p", "https://u:p@a.test/auth", True),
        ],
        "url string, link string, nofollow boolean",
    )
    rows = {
        (r.src_host, r.dst_host): r for r in host_graph(edges).collect()
    }
    assert set(rows) == {
        ("a.test", "b.test"),
        ("a.test", "a.test"),
        ("c.test", "a.test"),
    }
    ab = rows[("a.test", "b.test")]
    assert (ab.n_links, ab.n_nofollow, ab.n_pages) == (2, 0, 2)
    aa = rows[("a.test", "a.test")]  # the relative link resolves home
    assert (aa.n_links, aa.n_nofollow, aa.n_pages) == (1, 1, 1)
    ca = rows[("c.test", "a.test")]
    assert (ca.n_links, ca.n_nofollow, ca.n_pages) == (1, 1, 1)


def test_trustrank_decays_from_seeds_and_zeroes_unreachable(spark):
    """TrustRank semantics on a pinned graph: seed gets the teleport
    mass, its direct target inherits damped trust, a 2-hop target less,
    and a disconnected spam island scores exactly 0.0."""
    from pdf_ocr_spark.operators.graph import trustrank

    edges = spark.createDataFrame(
        [
            ("seed", "child"), ("child", "grand"),
            # spam island: links among themselves, unreachable from seed
            ("spam1", "spam2"), ("spam2", "spam1"),
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("seed",)], "node string")
    got = {r["node"]: r for r in trustrank(edges, seeds, iters=3).collect()}
    assert got["seed"]["is_seed"] and not got["child"]["is_seed"]
    assert got["seed"]["trust"] > 0
    assert got["child"]["trust"] > got["grand"]["trust"] > 0
    assert got["spam1"]["trust"] == 0.0 == got["spam2"]["trust"]


def test_trustrank_deterministic_across_partitionings(spark):
    from pdf_ocr_spark.operators.graph import trustrank

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 23}") for i in range(200)],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("n0",), ("n1",)], "node string")
    a = {
        r["node"]: r["trust"]
        for r in trustrank(edges.repartition(2), seeds, iters=3).collect()
    }
    b = {
        r["node"]: r["trust"]
        for r in trustrank(edges.repartition(17), seeds, iters=3).collect()
    }
    assert a == b


def test_harmonic_centrality_path_graph_pinned(spark):
    """Exact harmonic values on a directed path a→b→c→d at radius 3:
    H(a)=0, H(b)=1, H(c)=1+1/2, H(d)=1+1/2+1/3; n_reached counts the
    in-ball; radius truncation drops d(a→d) when radius=2."""
    from pdf_ocr_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r["node"]: r for r in harmonic_centrality(edges, radius=3).collect()}
    assert got["a"]["harmonic"] == 0.0 and got["a"]["n_reached"] == 0
    assert got["b"]["harmonic"] == 1.0
    assert abs(got["c"]["harmonic"] - 1.5) < 1e-9
    assert abs(got["d"]["harmonic"] - (1 + 0.5 + 1 / 3)) < 1e-9
    assert got["d"]["n_reached"] == 3

    r2 = {r["node"]: r for r in harmonic_centrality(edges, radius=2).collect()}
    assert abs(r2["d"]["harmonic"] - 1.5) < 1e-9  # a→d (d=3) truncated
    assert r2["d"]["n_reached"] == 2


def test_harmonic_centrality_cycle_excludes_self(spark):
    """On a 3-cycle every node reaches the other two (d=1, d=2) but not
    itself: H = 1 + 1/2 for all, n_reached = 2."""
    from pdf_ocr_spark.operators.graph import harmonic_centrality

    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    for r in harmonic_centrality(edges, radius=3).collect():
        assert abs(r["harmonic"] - 1.5) < 1e-9
        assert r["n_reached"] == 2


def test_label_propagation_splits_dense_cores(spark):
    """Two 4-cliques joined by one bridge edge: frequency voting keeps
    them as two communities (min-label propagation would merge them),
    and the result is identical under repartitioning."""
    from pdf_ocr_spark.operators.graph import label_propagation

    def clique(names):
        return [(a, b) for a in names for b in names if a < b]

    e = clique(["a1", "a2", "a3", "a4"]) + clique(["b1", "b2", "b3", "b4"])
    e.append(("a1", "b1"))                   # the stray bridge
    df = spark.createDataFrame(e, "src string, dst string")
    out = {r["node"]: r["community"]
           for r in label_propagation(df, rounds=2).collect()}
    a_comms = {out[n] for n in ("a1", "a2", "a3", "a4")}
    b_comms = {out[n] for n in ("b2", "b3", "b4")}
    assert a_comms == {"a1"}
    assert b_comms == {"b1"}
    again = {r["node"]: r["community"]
             for r in label_propagation(df.repartition(5),
                                        rounds=2).collect()}
    assert again == out


def test_label_propagation_isolated_pair_and_self_loop(spark):
    """A disconnected pair forms its own community under the min
    tie-break; self-loops are ignored."""
    from pdf_ocr_spark.operators.graph import label_propagation

    df = spark.createDataFrame(
        [("x", "y"), ("z", "z")], "src string, dst string"
    )
    out = {r["node"]: r["community"]
           for r in label_propagation(df, rounds=2).collect()}
    assert out == {"x": "x", "y": "x"}       # z: self-loop only → dropped


def test_pagerank_warm_start_converges_faster(spark):
    """One warm iteration from converged ranks stays closer to the
    fixed point than one cold iteration; unknown nodes fall back to
    1/N."""
    from pdf_ocr_spark.operators.graph import pagerank

    e = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(e, "src string, dst string")
    ref = {r["node"]: r["pr"] for r in pagerank(df, iters=12).collect()}
    cold1 = {r["node"]: r["pr"] for r in pagerank(df, iters=1).collect()}
    prior = pagerank(df, iters=6)
    warm1 = {r["node"]: r["pr"]
             for r in pagerank(df, iters=1, prior=prior).collect()}
    err_cold = sum(abs(cold1[n] - ref[n]) for n in ref)
    err_warm = sum(abs(warm1[n] - ref[n]) for n in ref)
    assert err_warm < err_cold
    # prior missing a node: new node seeds at 1/N, run still works
    from pyspark.sql import functions as F

    partial = prior.filter(F.col("node") != "d")
    out = {r["node"]: r["pr"]
           for r in pagerank(df, iters=1, prior=partial).collect()}
    assert set(out) == set(ref)

"""BM25 relevance scoring + inverted-index builder: pinned small-input
math and plan-shape checks."""

from __future__ import annotations

import math

from pdf_ocr_spark.operators.search import bm25_topk, build_postings


def _bm25_ref(tf, dl, n_docs, df, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_pinned_math(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark window"),       # dl 3
            (2, "spark merge merge merge"),  # dl 4
            (3, "window window window"),     # dl 3
            (4, "other words only here"),    # dl 4 — score 0, dropped
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["spark", "window"], k=10).collect()}
    assert 4 not in out
    n, avgdl = 4, 14 / 4
    exp = {
        1: round(_bm25_ref(2, 3, n, 2, avgdl) + _bm25_ref(1, 3, n, 2, avgdl), 4),
        2: round(_bm25_ref(1, 4, n, 2, avgdl), 4),
        3: round(_bm25_ref(3, 3, n, 2, avgdl), 4),
    }
    for d, s in exp.items():
        assert abs(out[d] - s) < 2e-4, (d, out[d], s)
    # k truncation keeps the best-scoring docs
    top1 = [r.doc_id for r in bm25_topk(docs, ["spark", "window"], k=1).collect()]
    best = max(exp, key=lambda d: (exp[d], -d))
    assert top1 == [best]


def test_bm25_topk_plan_no_global_sort(spark):
    docs = spark.createDataFrame(
        [(i, "spark text") for i in range(20)], "doc_id long, text string"
    )
    plan = bm25_topk(docs, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no Sort+Exchange


def test_build_postings(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "b")], "doc_id long, text string"
    )
    rows = {r.term: (r.df, list(r.postings)) for r in build_postings(docs).collect()}
    assert rows == {"a": (1, [1]), "b": (3, [1, 2, 3]), "c": (1, [2])}
    trimmed = {r.term for r in build_postings(docs, min_df=2).collect()}
    assert trimmed == {"b"}


def test_phrase_search_adjacency_and_counts(spark):
    """Phrase occurrences are counted per start position, overlapping
    allowed; near-miss word orders and gap-separated terms don't match."""
    from pdf_ocr_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the quick brown cat"),
            (2, "quick the brown"),        # order wrong
            (3, "the quick x brown"),      # gap
            (4, "THE   Quick Brown"),      # case + whitespace normalize
            (5, "quick brown quick brown quick brown"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in phrase_search(docs, ("quick", "brown")).collect()
    }
    assert set(out) == {1, 4, 5}
    assert out[1]["n_occurrences"] == 2 and out[1]["first_pos"] == 1
    assert out[4]["n_occurrences"] == 1 and out[4]["first_pos"] == 1
    assert out[5]["n_occurrences"] == 3 and out[5]["first_pos"] == 0


def test_phrase_search_three_terms_and_empty(spark):
    from pdf_ocr_spark.operators.search import phrase_search
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c d a b c"), (2, "a b x c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in phrase_search(docs, ("a", "b", "c")).collect()}
    assert set(out) == {1} and out[1]["n_occurrences"] == 2
    with pytest.raises(ValueError):
        phrase_search(docs, ())


def test_proximity_search_slop_semantics(spark):
    """slop=2 matches in-order terms with ≤2 intervening words; order
    still matters; slop=0 degenerates to the exact phrase; occurrences
    count distinct start anchors even when one start has several valid
    chains."""
    from pdf_ocr_spark.operators.search import phrase_search, proximity_search

    docs = spark.createDataFrame(
        [
            (1, "quick brown"),            # adjacent
            (2, "quick x brown"),          # gap 1
            (3, "quick x y brown"),        # gap 2
            (4, "quick x y z brown"),      # gap 3: beyond slop
            (5, "brown quick"),            # wrong order
            (6, "quick x brown brown"),    # one start, two chains
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in proximity_search(docs, ("quick", "brown"), slop=2).collect()
    }
    assert set(got) == {1, 2, 3, 6}
    assert got[6]["n_occurrences"] == 1  # distinct anchors, not chains

    exact = {r["doc_id"] for r in phrase_search(docs, ("quick", "brown")).collect()}
    slop0 = {
        r["doc_id"]
        for r in proximity_search(docs, ("quick", "brown"), slop=0).collect()
    }
    assert exact == slop0 == {1}  # doc 6's pairs all have a gap

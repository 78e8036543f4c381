"""Full-text relevance search over the extracted corpus: BM25 scoring
and an inverted-index (postings) builder — the corpus-exploration ops a
training-data pipeline runs to find, sample, and audit documents.

Design notes for 100 TB scale:
  * BM25 reads the corpus ONCE: per-term tfs are conditional sums inside
    the same groupBy that computes document length (no per-term scans,
    no words-table self-join); the query's term list is tiny by nature
  * corpus stats (N, avgdl, per-term df) reduce to ONE broadcast row;
    scoring is then a map-side expression — the only shuffles are the
    per-doc aggregate and the final top-k (TakeOrdered, no global sort)
  * per-term score contributions quantize to DECIMAL(18,6) before the
    sum, so scores are bit-reproducible across engines and partition
    orders (ties in the top-k break on doc id)
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.operators.text_analysis import norm_words_expr


def _doc_words(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(norm_words_expr(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Inverted index: (term, df, postings) with postings = the sorted
    doc-id array.  One shuffle (the term groupBy, map-side combined);
    ``min_df`` trims hapax noise.  At crawl scale the postings arrays
    for stop-words are huge — shard them downstream (this builder keeps
    one row per term, the relational representation)."""
    w = _doc_words(docs, text_col, id_col).distinct()
    return (
        w.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
        .select(F.col("w").alias("term"), "df", "postings")
    )


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 (Lucene-style idf = ln(1 + (N-df+0.5)/
    (df+0.5))) for a bag of query terms → (doc_id, score).

    ONE corpus scan: dl and every per-term tf come out of the same
    groupBy; (N, avgdl, df_t) reduce to one broadcast row; the final
    top-k is orderBy+limit (TakeOrdered — per-partition heaps, no
    global sort).  Zero-score docs are dropped before the top-k."""
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    w = _doc_words(docs, text_col, id_col)
    per_doc = w.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("w") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    contribs: List[Column] = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        c = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("dl") / avgdl))
        contribs.append(c.cast("decimal(18,6)"))
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(id_col, F.round(total, 4).cast("double").alias("score"))
        .filter(F.col("score") > 0)
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document TF-IDF keywords: the top-``k`` terms by
    tf · ln(N/df) — the corpus-exploration op behind tag clouds,
    cluster naming, and topic audits of a crawl.

    Scoring: tf = in-doc term count; df over terms with df ≥ ``min_df``
    (rarer terms are usually typos/ids at web scale and would dominate
    idf); score rounds to 4 decimals; top-k ties break on the term so
    the keyword set is fully deterministic.

    Plan at 100 TB: ONE words fan-out feeds both aggregates — the
    (doc, term) tf groupBy, then the term df groupBy on tf's (already
    distinct) output.  The df table is vocabulary-scale → BROADCAST
    back; the corpus-size scalar N reduces to a broadcast row (no
    driver collect).  The only other shuffle is the per-doc top-k
    window, which partitions by doc id — never global."""
    from pyspark.sql.window import Window

    dw = _doc_words(docs, text_col, id_col)
    tf = dw.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            F.col("tf"),
            F.col("df"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias(
                "tfidf"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def positional_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted index: (term, doc, pos) — the structure
    phrase and proximity queries need that document-level postings
    can't answer.  One posexplode over the normalized word sequence,
    ZERO shuffle (the explode inherits the corpus partitioning); at
    crawl scale the materialized index is written bucketed BY term so
    phrase joins below co-locate without a shuffle."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(norm_words_expr(F.col(text_col))).alias("pos", "term"),
    ).filter(F.col("term") != "")


def phrase_search(
    docs: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase query over positional postings: the classic IR
    adjacency join — filter the postings to the phrase's terms (the
    index-scan step: nothing else leaves the scan), then chain
    equi-joins on (doc, pos + offset) so surviving rows are exactly the
    phrase occurrences.  Output: (doc, n_occurrences, first_pos),
    n_occurrences counting every start position.

    Plan at 100 TB: each join side is the postings of ONE term
    (df(term) rows, not the corpus); joins key on (doc, pos) so with a
    term-bucketed index the per-term slices arrive pre-pruned, and the
    adjacency joins shuffle only the phrase terms' postings.  Catalyst
    pushes the `term = w_i` filters into the scan.  The rare-term-first
    heuristic (join the smallest postings list first) is AQE's job —
    declared joins are reorderable.

    Complements `bm25_topk` (bag-of-words relevance): phrase match is
    the precision tool for corpus audit queries ("find this exact
    quote"), decontamination spot checks, and boilerplate hunting."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    post = positional_postings(docs, text_col, id_col)
    out = post.filter(F.col("term") == phrase[0]).select(
        "doc", F.col("pos").alias("first_pos")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = post.filter(F.col("term") == term).select(
            "doc", (F.col("pos") - i).alias("first_pos")
        )
        out = out.join(nxt, ["doc", "first_pos"])
    return (
        out.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("first_pos").alias("first_pos"),
        )
        .select(F.col("doc").alias("doc_id"), "n_occurrences", "first_pos")
    )


def proximity_search(
    docs: DataFrame,
    phrase: Sequence[str],
    slop: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ordered proximity query (Lucene's sloppy phrase, simplified to
    the ordered case): the phrase terms must appear in order with at
    most ``slop`` extra words between consecutive terms.  Same
    index-scan shape as :func:`phrase_search` — per-term postings
    filters pushed into the scan — but the adjacency equi-joins widen
    into BOUNDED range joins (pos in (prev, prev+slop+1]): each probe
    row fans out to at most slop+1 candidates, so the join stays
    linear in the postings, never a cross product.

    A single start position can chain to several intermediate
    placements; occurrences are counted per DISTINCT start anchor
    (countDistinct first_pos) so the result is well-defined.

    Output: (doc_id, n_occurrences, first_pos).  slop=0 degenerates to
    the exact phrase semantics."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    post = positional_postings(docs, text_col, id_col)
    out = post.filter(F.col("term") == phrase[0]).select(
        "doc", F.col("pos").alias("first_pos"), F.col("pos").alias("_prev")
    )
    for term in phrase[1:]:
        nxt = post.filter(F.col("term") == term).select(
            F.col("doc").alias("_d"), F.col("pos").alias("_next")
        )
        out = (
            out.join(
                nxt,
                (F.col("doc") == F.col("_d"))
                & (F.col("_next") > F.col("_prev"))
                & (F.col("_next") <= F.col("_prev") + 1 + slop),
            )
            .select("doc", "first_pos", F.col("_next").alias("_prev"))
        )
    return (
        out.groupBy("doc")
        .agg(
            F.countDistinct("first_pos").alias("n_occurrences"),
            F.min("first_pos").alias("first_pos"),
        )
        .select(F.col("doc").alias("doc_id"), "n_occurrences", "first_pos")
    )

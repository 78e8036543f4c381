"""Trained document-quality classifier — hashed-bag-of-words Naive
Bayes, the relational stand-in for the fastText quality models that
CCNet / DCLM / FineWeb-edu pipelines run between the rule gates
(Gopher/C4) and the LM-perplexity scorer.

Why NB and not SGD: closed-form training IS two aggregations — per-
(bucket, class) occurrence counts and the class totals — so the whole
trainer is Spark groupBys, bit-reproducible, and replayable by the
DuckDB oracle; no iterative optimizer state, no learning-rate
nondeterminism.  The model quality matches fastText's own supervised
mode closely at this feature granularity (hashed unigrams), and the
SCORING plan — explode words, broadcast the weight table, one
map-side-combined per-doc sum — is identical to what a 100-TB fastText
scorer would run.

Determinism protocol (the ``domain_kl_drift`` precedent): every
log-space weight is ``round(ln(·), 6)`` cast to DECIMAL(18,6) — the
6-dp rounding absorbs cross-engine libm ULP differences, and decimal
sums are exact and order-independent, so per-doc scores are
bit-identical across engines and partitionings.  The class decision
compares the EXACT decimal sum to zero.

Weight table layout (one broadcastable DataFrame carries the whole
model):
  bucket >= 0 : observed feature buckets — (bucket, pos_cnt, neg_cnt,
                weight) with weight = round(ln((pos_cnt+1)/(tot_pos+B))
                - ln((neg_cnt+1)/(tot_neg+B)), 6)
  bucket = -1 : the UNSEEN-bucket default (Laplace mass only)
  bucket = -2 : the class prior round(ln(n_pos_docs/n_neg_docs), 6)

Scale notes: training fan-out is the corpus word explode into a
groupBy bounded by ``buckets``×2 — map-side combined, never
corpus-sized state; the model is ≤ buckets+2 rows (driver/broadcast
scale by construction).  Scoring shuffles only the per-(doc) partial
sums.  No Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from pdf_ocr_spark.operators.dedup import _h64
from pdf_ocr_spark.operators.text_analysis import norm_words_expr

DEFAULT_BUCKET = -1
PRIOR_BUCKET = -2
HASH_SALT = "nbq"


def feature_bucket(word: Column, buckets: int) -> Column:
    """Hashed-unigram feature bucket: the shared md5-based 60-bit hash
    (DuckDB twin: CAST(('0x' || substr(md5(w || ':nbq'), 1, 15)) AS
    BIGINT) % buckets)."""
    return (_h64(word, HASH_SALT) % buckets).cast("int")


def _doc_words(docs: DataFrame, text_col: str, extra_cols) -> DataFrame:
    return docs.select(
        *extra_cols, F.explode(norm_words_expr(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")


def nb_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """Closed-form NB training over docs carrying a 0/1 ``label_col``.
    Returns the full model as one weight table (layout in the module
    docstring) — ≤ buckets+2 rows, broadcast-shaped."""
    words = _doc_words(docs, text_col, [F.col(label_col).alias("y")])
    cnts = (
        words.select(feature_bucket(F.col("w"), buckets).alias("bucket"), "y")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("pos_cnt"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("neg_cnt"),
        )
    )
    totals = cnts.agg(
        F.sum("pos_cnt").alias("tot_pos"), F.sum("neg_cnt").alias("tot_neg")
    )
    b = F.lit(buckets)
    wexpr = F.round(
        F.log((F.col("pos_cnt") + 1) / (F.col("tot_pos") + b))
        - F.log((F.col("neg_cnt") + 1) / (F.col("tot_neg") + b)),
        6,
    ).cast("decimal(18,6)")
    observed = cnts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.col("pos_cnt").cast("long").alias("pos_cnt"),
        F.col("neg_cnt").cast("long").alias("neg_cnt"),
        wexpr.alias("weight"),
    )
    default = totals.select(
        F.lit(DEFAULT_BUCKET).alias("bucket"),
        F.lit(0).cast("long").alias("pos_cnt"),
        F.lit(0).cast("long").alias("neg_cnt"),
        F.round(
            F.log(F.lit(1.0) / (F.col("tot_pos") + b))
            - F.log(F.lit(1.0) / (F.col("tot_neg") + b)),
            6,
        ).cast("decimal(18,6)").alias("weight"),
    )
    ndocs = docs.agg(
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col(label_col) == 0, 1).otherwise(0)).alias("n_neg"),
    )
    # a single-class corpus must not crash the trainer (ANSI mode turns
    # n_pos/0 into DIVIDE_BY_ZERO): degenerate priors pin to 0
    prior = ndocs.select(
        F.lit(PRIOR_BUCKET).alias("bucket"),
        F.col("n_pos").cast("long").alias("pos_cnt"),
        F.col("n_neg").cast("long").alias("neg_cnt"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(F.log(F.col("n_pos") / F.col("n_neg")), 6),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(18,6)")
        .alias("weight"),
    )
    return observed.unionByName(default).unionByName(prior)


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
) -> DataFrame:
    """Score documents with a trained NB weight table: word explode →
    broadcast LEFT join on bucket (unseen buckets take the Laplace
    default row) → one exact per-doc DECIMAL sum + the prior.  Output
    (id, nb_score double rounded to 4 dp, pred 1/0 from the EXACT
    decimal sign test).  Empty docs score the bare prior."""
    obs = model.filter(F.col("bucket") >= 0).select("bucket", "weight")
    dflt = model.filter(F.col("bucket") == DEFAULT_BUCKET).select(
        F.col("weight").alias("dw")
    )
    prior = model.filter(F.col("bucket") == PRIOR_BUCKET).select(
        F.col("weight").alias("prior")
    )
    words = _doc_words(docs, text_col, [F.col(id_col)])
    per_doc = (
        words.select(id_col, feature_bucket(F.col("w"), buckets).alias("bucket"))
        .join(F.broadcast(obs), "bucket", "left")
        .crossJoin(F.broadcast(dflt))
        .select(id_col, F.coalesce("weight", "dw").alias("w"))
        .groupBy(id_col)
        .agg(F.sum("w").alias("s"))
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            F.round(
                (F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,6)"))
                 + F.col("prior")).cast("double"),
                4,
            ).alias("nb_score"),
            F.when(
                F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,6)"))
                + F.col("prior")
                > 0,
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("pred"),
        )
    )

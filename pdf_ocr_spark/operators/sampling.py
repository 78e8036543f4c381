"""Deterministic sampling operators for training-mix curation.

``df.sample()`` is seed-dependent per partition-split and not
reproducible across engines or cluster layouts; training-data pipelines
need sampling that is (a) stable under repartitioning/resume, (b)
exactly replayable by the oracle, and (c) stratified (per-language /
per-domain target rates).  Hash-threshold sampling gives all three: keep
a row iff ``h(key) mod M < rate * M`` with the md5-derived 40-bit hash
shared with the dedup operators — pure codegen'd column expressions, no
RNG state anywhere."""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.operators.dedup import _hbase40

_M = 10_000  # rate resolution: 0.01%


def hash_keep_expr(key: Column, rate: float) -> Column:
    """True for a deterministic ``rate`` fraction of keys (same verdict
    for the same key on every run, engine, and partitioning)."""
    return (_hbase40(key.cast("string")) % _M) < int(round(rate * _M))


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash-threshold sampling: each stratum keeps its own
    target fraction of rows (training-mix reweighting — e.g. downsample
    English, keep all of a low-resource language).  Strata absent from
    ``rates`` fall back to ``default_rate``.

    The rate lookup compiles to a CASE expression (broadcast-free: the
    map is a plan literal), the verdict to one md5 + modulo per row —
    no shuffle, no RNG, resume-stable."""
    rate = F.lit(int(round(default_rate * _M)))
    for stratum, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(r * _M)))
        ).otherwise(
            rate
        )
    keep = (_hbase40(F.col(key_col).cast("string")) % _M) < rate
    return df.filter(keep)

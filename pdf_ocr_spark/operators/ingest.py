"""Ingestion validation over the Common-Crawl-style pages table
(url, warc_ts, html, text, lang) — the quarantine gate a pipeline runs
BEFORE spending extraction compute: malformed rows route to a
quarantine sink with machine-readable reasons instead of poisoning the
hot path or silently vanishing.

Every rule is a codegen'd column expression (no UDF), so the gate adds
one map-side projection to the scan — zero shuffle — and replays
verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# epoch-second bounds: before the web existed / absurdly far future —
# out-of-range warc_ts means a corrupted WARC header, not a real fetch
TS_MIN_EPOCH = 789_000_000  # 1995-01-02
TS_MAX_EPOCH = 2_050_000_000  # 2034-12-17

ALLOWED_LANGS = ("en", "de", "fr", "es", "zh", "ja", "ko", "ru", "unknown")


def _reason(cond: Column, tag: str) -> Column:
    return F.when(cond, F.lit(tag))


def ingest_validate(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-row validation verdicts: (url, valid, reasons) where
    ``reasons`` is the sorted '|'-joined list of violated rules —
    deterministic, so quarantine routing is resume-stable and the
    verdict table value-hashes.

    Rules:
      * ``bad_url``     — null, or not ``http(s)://host...`` shaped
      * ``bad_ts``      — null, or epoch outside [1995, 2035) (a
        corrupted WARC date, not a real fetch time)
      * ``no_content``  — html AND text both null/empty (nothing to
        extract; distinct from extraction failures, which are real
        work and get lineage rows instead)
      * ``bad_lang``    — a tag outside the pipeline's routing set
        (null is fine: lang is a hint, not a requirement)

    Plan at 100 TB: one map-side projection on the scan, NO shuffle;
    the quarantine split downstream is two filters on ``valid`` over
    the same cached/columnar read."""
    url = F.col(url_col)
    ts = F.col(ts_col)
    epoch = F.unix_timestamp(ts)
    html = F.col(html_col)
    text = F.col(text_col)
    lang = F.col(lang_col)
    reasons = F.array(
        _reason(
            url.isNull() | ~url.rlike(r"^https?://[^\s/?#]+"), "bad_url"
        ),
        _reason(
            ts.isNull()
            | (epoch < TS_MIN_EPOCH)
            | (epoch >= TS_MAX_EPOCH),
            "bad_ts",
        ),
        _reason(
            (html.isNull() | (F.length(html) == 0))
            & (text.isNull() | (F.length(text) == 0)),
            "no_content",
        ),
        _reason(
            lang.isNotNull() & ~lang.isin(*ALLOWED_LANGS), "bad_lang"
        ),
    )
    reasons = F.array_sort(F.filter(reasons, lambda r: r.isNotNull()))
    return pages.select(
        url.alias("url"),
        (F.size(reasons) == 0).alias("valid"),
        F.array_join(reasons, "|").alias("reasons"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship run: the full extraction pipeline applied to
the sf0.001 documents table (texts wrapped as HTML payloads) plus the
synthetic multi-format corpus; returns the per-url extraction results.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing), each with a
DuckDB-runnable ANSI-SQL oracle where the semantics are SQL-expressible
(the extraction kernels and the fake media decoder are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: run the extraction
    pipeline over real testdata texts packaged as Common-Crawl-style HTML
    rows, unioned with the synthetic PDF/HTML corpus (which exercises the
    PDF kernel, OCR branch, and poison-row lineage)."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.fixtures.genpages import gen_rows
    from pdf_ocr_spark.pipeline.extract_job import extract_documents

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    html_pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><nav><a href='/'>home</a></nav><article><p>"),
                F.col("text"),
                F.lit("</p></article><footer><a href='/t'>terms</a></footer></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    synth = spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"])
            for r in gen_rows(60)
        ],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages = html_pages.unionByName(synth)
    result = extract_documents(pages)
    return result.select(
        "url", "content_kind", "status", "n_pages", "n_blocks", "n_chars"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_ocr_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from pdf_ocr_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()

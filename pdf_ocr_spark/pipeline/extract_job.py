"""The extraction pipeline: pages table → extracted_text per url.

Physical plan (SURVEY.md §4.3 — one explicit shuffle, everything else
partition-local):

    scan(pages)  [column-pruned to url, html — lineage queries never
                  read the binary]
     → repartition(P, xxhash64(url))            # salts giant-PDF skew
     → mapInPandas(extract_batch)               # K1+K3+K5 kernels, Arrow
         emits page rows (url, page, page_text, needs_ocr, ocr_payload…)
     → OCR branch: filter(needs_ocr) → mapInPandas(ocr_batch)  # K2 stub,
         batched per Arrow batch = per-partition-chunk model inference
     → unionByName
     → groupBy(url) ordered page concat          # A1/A2, collapses into
         the extractor's partitioning (AQE sees co-partitioned input)
     → sink: parquet (Iceberg-compatible layout) + lineage sidecar

Resume (J3, the north rule): restarts anti-join the input against the
already-committed output's urls — only the remainder is processed.

Per-row invariant vs the reference: byte-identical extracted text per url
(page text = blocks joined '\\n', v2:684-686; doc text = concatenated
'# 第 {i} 页\\n\\n…\\n\\n' chunks, v2:697,715-718; HTML rows carry the
boilerplate-stripped main text with no page headers — HTML is unpaginated).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("content_kind", StringType()),  # 'pdf' | 'html' | 'unknown'
        StructField("page", IntegerType()),         # 1-based; 0 for doc-level failure
        StructField("page_text", StringType()),
        StructField("n_blocks", IntegerType()),
        StructField("needs_ocr", BooleanType()),
        StructField("ocr_payload", BinaryType()),
        StructField("status", StringType()),        # 'ok' | 'failed'
        StructField("failure_reason", StringType()),
        StructField("n_bytes", LongType()),         # input payload size
    ]
)

DOC_SCHEMA_COLS = [
    "url",
    "content_kind",
    "extracted_text",
    "n_pages",
    "n_blocks",
    "n_chars",
    "status",
    "failure_reason",
]


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched document extractor (runs on executors).

    One call per Arrow batch; per-document try/except so a poison row
    yields a lineage row, never a task failure (SURVEY.md §4.1)."""
    # imports inside: the function must be self-contained for pickling
    from pdf_ocr_spark.kernels.html_extract import extract_html
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            n_bytes = len(data)
            try:
                if data[:5] == b"%PDF-" or (b"%PDF-" in data[:1024]):
                    doc = extract_pdf(data)
                    if doc.status != "ok":
                        rows.append(
                            (url, "pdf", 0, None, 0, False, None,
                             "failed", doc.failure_reason, n_bytes)
                        )
                        continue
                    for p in doc.pages:
                        rows.append(
                            (url, "pdf", p.page_num,
                             None if p.needs_ocr else p.text,
                             p.n_blocks, p.needs_ocr, p.ocr_payload,
                             "ok", None, n_bytes)
                        )
                else:
                    text, status, reason = extract_html(data)
                    rows.append(
                        (url, "html", 1, text if status == "ok" else None,
                         text.count("\n") + 1 if text else 0, False, None,
                         status, reason, n_bytes)
                    )
            except Exception as e:  # noqa: BLE001 — poison-row isolation
                rows.append(
                    (url, "unknown", 0, None, 0, False, None,
                     "failed", f"kernel_crash: {type(e).__name__}", n_bytes)
                )
        yield pd.DataFrame(rows, columns=[f.name for f in PAGE_SCHEMA.fields])


def ocr_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Batched OCR inference over image-only pages (K2).

    The engine is initialized lazily once per executor python worker —
    the reference's load-model-once pattern
    (/root/reference/parse_student_answers.py:143-175).  In production the
    stub is swapped for a PaddleOCR/vLLM client; batching shape
    (many pages per call) mirrors the remote-VLM script's per-page calls
    amortized per partition
    (/root/reference/pdf_ocr_with_silicon_remote_vllm.py:162-232)."""
    from pdf_ocr_spark.kernels.ocr_stub import get_engine, ocr_page_text

    engine = get_engine()
    for pdf_batch in batches:
        mask = pdf_batch["needs_ocr"].fillna(False).astype(bool)
        if not mask.any():
            # pure pass-through batch: no inference, no copies
            yield pdf_batch.assign(ocr_payload=None)
            continue
        images = [
            bytes(b) if b is not None else None
            for b in pdf_batch.loc[mask, "ocr_payload"]
        ]
        results = engine.recognize_batch(images)
        texts = [ocr_page_text(boxes) for boxes in results]
        out = pdf_batch.copy()
        out.loc[mask, "page_text"] = texts
        out["needs_ocr"] = False
        out["ocr_payload"] = None
        yield out


def extract_pages(
    pages_df: DataFrame,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """pages(url, html, …) → page-level extraction rows.

    The explicit ``repartition(P, xxhash64(url))`` is the job's single
    planned shuffle: it spreads documents uniformly regardless of input
    file layout, bounding skew from giant PDFs (SURVEY.md §4.1)."""
    df = pages_df.select("url", "html")
    if num_partitions is None:
        num_partitions = max(pages_df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartition(num_partitions, F.xxhash64("url"))
    extracted = df.mapInPandas(extract_batch, schema=PAGE_SCHEMA)

    # OCR stage: a pass-through mapInPandas on the SAME partitioning — no
    # shuffle, no branch (a filter+union here would execute the expensive
    # extractor twice); batches with no image-only pages flow through
    # untouched, batches with them run one batched inference call
    return extracted.mapInPandas(ocr_batch, schema=PAGE_SCHEMA)


def assemble_documents(page_rows: DataFrame) -> DataFrame:
    """Page rows → one row per url with the final extracted_text.

    All built-ins (A1/A2): ordered ``collect_list(struct(page, text))`` →
    ``array_sort`` → per-page header via ``transform`` + ``format_string``
    (v2's '# 第 {i} 页' chunk, pdf_ocr_with_boxes_v2.py:697) →
    ``array_join``.  HTML rows skip headers (unpaginated)."""
    pages = page_rows.groupBy("url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("page").alias("page"),
                    F.coalesce(F.col("page_text"), F.lit("")).alias("page_text"),
                )
            )
        ).alias("pages"),
        F.max("content_kind").alias("content_kind"),
        F.sum("n_blocks").cast("int").alias("n_blocks"),
        F.max(F.col("page")).cast("int").alias("n_pages"),
        F.min("status").alias("status"),  # 'failed' < 'ok'
        F.max("failure_reason").alias("failure_reason"),
        F.max("n_bytes").alias("n_bytes"),
    )
    pdf_text = F.array_join(
        F.transform(
            F.col("pages"),
            lambda s: F.format_string("# 第 %d 页\n\n%s\n\n", s.page, s.page_text),
        ),
        "",
    )
    html_text = F.array_join(F.transform(F.col("pages"), lambda s: s.page_text), "")
    extracted = (
        F.when(F.col("status") == "failed", F.lit(None).cast("string"))
        .when(F.col("content_kind") == "pdf", pdf_text)
        .otherwise(html_text)
    )
    return pages.select(
        "url",
        "content_kind",
        extracted.alias("extracted_text"),
        F.when(F.col("status") == "failed", F.lit(0))
        .otherwise(F.col("n_pages"))
        .alias("n_pages"),
        F.coalesce(F.col("n_blocks"), F.lit(0)).alias("n_blocks"),
        F.coalesce(F.length(extracted), F.lit(0)).alias("n_chars"),
        "status",
        "failure_reason",
        "n_bytes",
    )


def extract_documents(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """Full pipeline: pages table → document-level extraction results."""
    return assemble_documents(extract_pages(pages_df, num_partitions))


def lineage_metrics(page_rows: DataFrame) -> DataFrame:
    """Per-partition lineage/metrics sidecar rows (north rule): input
    split id, doc & page counts, byte counts, failure-reason histogram.
    Mirrors the reference's summary JSON
    (/root/reference/pdf_ocr_with_boxes_v3.py:413-428) but per partition
    and queryable."""
    return (
        page_rows.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.countDistinct("url").alias("n_docs"),
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum(F.when(F.col("needs_ocr"), 1).otherwise(0)).alias("n_ocr_pages"),
            F.sum("n_bytes").alias("n_bytes"),
            F.array_sort(
                F.collect_set(F.split(F.col("failure_reason"), ":").getItem(0))
            ).alias("failure_kinds"),
        )
    )


def resume_filter(input_df: DataFrame, completed_urls: DataFrame) -> DataFrame:
    """J3 resume anti-join: drop rows whose url is already committed.

    On Iceberg this reads the last committed snapshot; here, the output
    parquet dir.  One line, but it is what makes a 10^12-doc run
    restartable (north rule)."""
    return input_df.join(completed_urls.select("url"), "url", "left_anti")


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    sidecar_path: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> int:
    """Checkpointable batch run: resume → extract → append-commit.

    Returns the number of documents processed in this invocation."""
    pages = spark.read.parquet(input_path)
    if _parquet_exists(output_path):
        done = spark.read.parquet(output_path)
        pages = resume_filter(pages, done)
    page_rows = extract_pages(pages, num_partitions)
    # the extractor is expensive: materialize page rows once, derive both
    # the main table and the sidecar from the cached result (SURVEY.md §4.2
    # double-execution caveat)
    page_rows = page_rows.persist()
    try:
        docs = assemble_documents(page_rows)
        docs.write.mode("append").parquet(output_path)
        if sidecar_path is not None:
            lineage_metrics(page_rows).withColumn(
                "run_output", F.lit(output_path)
            ).write.mode("append").parquet(sidecar_path)
        n = spark.read.parquet(output_path).count()
    finally:
        page_rows.unpersist()
    return n


def _parquet_exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    return any(
        name.endswith(".parquet") or name == "_SUCCESS" for name in os.listdir(path)
    )

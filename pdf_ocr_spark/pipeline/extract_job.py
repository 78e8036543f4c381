"""The extraction pipeline: pages table → extracted_text per url.

Physical plan (SURVEY.md §4.3 — one explicit shuffle, everything else
partition-local).  The HOT PATH is fully fused:

    scan(pages)  [column-pruned to url, html — lineage queries never
                  read the binary]
     → repartition(P, xxhash64(url))            # salts giant-PDF skew
     → mapInArrow(extract_docs_arrow)           # K1+K3+K5 kernels + K2
         (parse, batched OCR, per-doc assembly — one Arrow pass; the
         groupBy(url) aggregation is partition-local by construction
         because the repartition co-locates whole documents, so it runs
         inside the UDF rather than as a shuffle)
     → sink: parquet (Iceberg-compatible layout) + lineage sidecar

A page-level route (``extract_batch`` → ``ocr_batch`` →
``assemble_documents``) is kept as the page-table API and as the
semantics oracle for the fused path; tests assert both emit identical
documents.

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
from pyspark.sql.window import Window
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
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


_GC_TUNED = False

# page-count tables persisted by extract_documents_split (the count pass
# feeds both the ranges join and the failed-giants join); bounded to the
# most recent call's — the same cache-ownership protocol as
# dedup.release_candidate_cache(), so a long-lived driver looping over
# corpora cannot accumulate cached count tables.
_live_split_caches: list = []


def release_split_cache() -> None:
    """Unpersist every giant-doc page-count cache owned by this module
    (at most the latest extract_documents_split call's).  Plans stay
    correct after release — the cache only avoids re-running the count
    pass once per consumer."""
    while _live_split_caches:
        df = _live_split_caches.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass


# typed TRANSIENT failure: the OCR engine gave up on a page after retries.
# Distinct from parse failures (permanent) — resume_filter retries these.
OCR_FAILED_REASON = "ocr_failed: engine error after retries"


def looks_like_pdf(data: bytes) -> bool:
    """Content sniff (P9).  ``%PDF-`` as the (whitespace/NUL-tolerant)
    prefix is definitive; a header within the first KB (the spec/Acrobat
    allowance for junk-prefixed files — stray HTTP headers, ad banners)
    also counts UNLESS the prefix is markup, in which case the magic is
    just page text mentioning PDFs.  Mirrors the reference's extension
    dispatch (/root/reference/pdf_ocr_with_boxes_v2.py:744-747) made
    content-based."""
    stripped = data.lstrip(b" \t\r\n\f\x00")
    if stripped[:5] == b"%PDF-":
        return True
    idx = data.find(b"%PDF-", 0, 1024)
    if idx <= 0:
        return False
    prefix = data[:idx].lower()
    return (
        stripped[:1] != b"<"
        and b"<html" not in prefix
        and b"<!doctype" not in prefix
    )


def _tune_worker_gc() -> None:
    """Once per executor python worker: freeze the post-import heap out of
    the cyclic collector and raise its thresholds.  The kernels allocate
    millions of small acyclic objects (glyph tuples, token lists); with
    default thresholds the cyclic GC rescans the heap constantly — pure
    memory-bandwidth waste that measurably halves many-core throughput
    (cycles are still collected, just at 200k-allocation granularity)."""
    global _GC_TUNED
    if _GC_TUNED:
        return
    import gc

    gc.freeze()
    gc.set_threshold(200_000, 100, 100)
    _GC_TUNED = True


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched document extractor (runs on executors).

    One call per Arrow batch; per-document try/except so a poison row
    yields a lineage row, never a task failure (SURVEY.md §4.1)."""
    # imports inside: the function must be self-contained for pickling
    from pdf_ocr_spark.kernels.html_extract import extract_html
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    _tune_worker_gc()

    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            n_bytes = len(data)
            try:
                if looks_like_pdf(data):
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
        for i, t in zip(out.index[mask], texts):
            if t is None:  # engine failure marker — NOT a blank page
                out.loc[i, "status"] = "failed"
                out.loc[i, "failure_reason"] = OCR_FAILED_REASON
            else:
                out.loc[i, "page_text"] = t
        # needs_ocr stays True as the was-OCR marker (the text is filled in)
        # so assemble_documents / lineage_metrics count n_ocr_pages the same
        # on every route — matches extract_range_batch's contract
        out["ocr_payload"] = None
        yield out


DOC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("content_kind", StringType()),
        StructField("extracted_text", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_chars", IntegerType()),
        StructField("status", StringType()),
        StructField("failure_reason", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_ocr_pages", IntegerType()),
    ]
)


def _assemble_doc(
    url: str,
    kind: str,
    pages: list,  # [(page_num, text_or_None, n_blocks)] in page order
    status: str,
    reason,
    n_bytes: int,
    n_ocr: int = 0,
) -> tuple:
    """Kernel-side twin of :func:`assemble_documents` — MUST keep the
    byte-identical text semantics (v2's '# 第 {i} 页\\n\\n…\\n\\n' chunks
    for PDFs, raw concatenation for unpaginated HTML)."""
    if status == "failed":
        return (url, kind, None, 0, 0, 0, "failed", reason, n_bytes, 0)
    pages = sorted(pages, key=lambda p: p[0])
    if kind == "pdf":
        text = "".join(
            "# 第 %d 页\n\n%s\n\n" % (p, t if t is not None else "")
            for p, t, _ in pages
        )
    else:
        text = "".join(t if t is not None else "" for _, t, _ in pages)
    n_pages = max(p for p, _, _ in pages)
    n_blocks = sum(b for _, _, b in pages)
    return (url, kind, text, n_pages, n_blocks, len(text), "ok", None, n_bytes, n_ocr)


def _parse_batch(urls, payloads, engine):
    """Shared fused-extractor core: parse + batched OCR + per-doc
    assembly for one batch of documents.  Returns (doc_rows, engine).

    OCR batching semantics: all image-only pages of the batch go to the
    engine as ONE ``recognize_batch`` call (the reference's
    batched-inference pattern,
    /root/reference/pdf_ocr_with_silicon_remote_vllm.py:162-232)."""
    from pdf_ocr_spark.kernels.html_extract import extract_html
    from pdf_ocr_spark.kernels.ocr_stub import get_engine, ocr_page_text
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    docs = []  # (url, kind, pages[(num,text,n_blocks)], status, reason, n_bytes)
    ocr_jobs = []  # (doc_idx, page_slot, payload)
    for url, payload in zip(urls, payloads):
        data = bytes(payload) if payload is not None else b""
        n_bytes = len(data)
        try:
            if looks_like_pdf(data):
                doc = extract_pdf(data)
                if doc.status != "ok":
                    docs.append((url, "pdf", [], "failed", doc.failure_reason, n_bytes))
                    continue
                pages = []
                for p in doc.pages:
                    if p.needs_ocr:
                        ocr_jobs.append((len(docs), len(pages), p.ocr_payload))
                        pages.append([p.page_num, None, p.n_blocks])
                    else:
                        pages.append([p.page_num, p.text, p.n_blocks])
                docs.append((url, "pdf", pages, "ok", None, n_bytes))
            else:
                text, status, reason = extract_html(data)
                n_blocks = text.count("\n") + 1 if text else 0
                docs.append(
                    (url, "html",
                     [[1, text if status == "ok" else None, n_blocks]],
                     status, reason, n_bytes)
                )
        except Exception as e:  # noqa: BLE001 — poison-row isolation
            docs.append(
                (url, "unknown", [], "failed",
                 f"kernel_crash: {type(e).__name__}", n_bytes)
            )
    ocr_counts = [0] * len(docs)
    if ocr_jobs:
        if engine is None:
            engine = get_engine()
        results = engine.recognize_batch([p for _, _, p in ocr_jobs])
        for (di, slot, _), boxes in zip(ocr_jobs, results):
            text = ocr_page_text(boxes)
            if text is None:  # engine failure after retries → typed failure
                u, k, _pages, _s, _r, nb = docs[di]
                docs[di] = (u, k, [], "failed", OCR_FAILED_REASON, nb)
                continue
            if docs[di][3] == "failed":
                continue  # a sibling page already failed this document
            docs[di][2][slot][1] = text
            ocr_counts[di] += 1
    return [_assemble_doc(*d, n_ocr=c) for d, c in zip(docs, ocr_counts)], engine


def extract_docs_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fused document extractor, pandas flavor (``mapInPandas``)."""
    _tune_worker_gc()
    engine = None
    for pdf_batch in batches:
        rows, engine = _parse_batch(pdf_batch["url"], pdf_batch["html"], engine)
        yield pd.DataFrame(rows, columns=[f.name for f in DOC_SCHEMA.fields])


def extract_docs_arrow(batches):
    """Fused document extractor, Arrow flavor (``mapInArrow``) — the HOT
    path: skips the pandas construction/conversion on both sides of the
    worker (measured +10–18% pipeline throughput over ``mapInPandas`` at
    8/32 cores on the synthetic corpus).

    The page-level route (``extract_batch`` → ``ocr_batch`` →
    ``assemble_documents``) round-trips every page row through Arrow twice
    and shuffles again for the groupBy; but the explicit
    ``repartition(xxhash64(url))`` already co-locates whole documents, so
    the aggregation is partition-local by construction and runs inside
    this UDF."""
    import pyarrow as pa

    _tune_worker_gc()
    engine = None
    types = (
        pa.string(), pa.string(), pa.string(), pa.int32(), pa.int32(),
        pa.int32(), pa.string(), pa.string(), pa.int64(), pa.int32(),
    )
    names = [f.name for f in DOC_SCHEMA.fields]
    for rb in batches:
        rows, engine = _parse_batch(
            rb.column(0).to_pylist(), rb.column(1).to_pylist(), engine
        )
        cols = list(zip(*rows)) if rows else [[] for _ in names]
        yield pa.record_batch(
            [pa.array(c, t) for c, t in zip(cols, types)], names=names
        )


BLOCK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_num", IntegerType()),
        StructField("block_index", IntegerType()),
        StructField("type", StringType()),  # 'title' | 'text' | 'table' | 'ocr'
        StructField("bbox", ArrayType(DoubleType())),  # [x0,y0,x1,y1] top-down
        StructField("text", StringType()),
        StructField("confidence", DoubleType()),
    ]
)


def extract_blocks_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Block-level extractor (runs on executors): one row per typed layout
    block with bbox + confidence — the reference's blocks JSON sink
    (/root/reference/pdf_ocr_with_boxes_v3.py:220-227,374-377,430-441)
    as a queryable table (SURVEY.md §1.3 documents → pages → blocks).

    PDF-only by design, like the reference tool: HTML rows carry no layout
    geometry.  Text pages emit the kernel's XY-cut blocks (type
    'title'/'text', confidence 0.95 — v3:226); image-only pages run
    batched OCR and emit one 'ocr' block per recognized line with the
    engine confidence and a NULL bbox (the stub engine carries no
    geometry; a PaddleOCR backend supplies detector quads here).
    OCR-failed pages emit no rows — the doc-level route carries the typed
    ``ocr_failed`` failure."""
    from pdf_ocr_spark.kernels.ocr_stub import OCR_MIN_CONFIDENCE, get_engine
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    _tune_worker_gc()
    engine = None
    cols = [f.name for f in BLOCK_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        ocr_jobs = []  # (url, page_num, payload)
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not looks_like_pdf(data):
                continue
            try:
                doc = extract_pdf(data)
            except Exception:  # noqa: BLE001 — poison-row isolation
                continue
            if doc.status != "ok":
                continue
            for blk in doc.blocks:
                rows.append(
                    (url, blk.page_num, blk.block_index, blk.type,
                     [float(v) for v in blk.bbox], blk.text, blk.confidence)
                )
            for p in doc.pages:
                if p.needs_ocr:
                    ocr_jobs.append((url, p.page_num, p.ocr_payload))
        if ocr_jobs:
            if engine is None:
                engine = get_engine()
            results = engine.recognize_batch([p for _, _, p in ocr_jobs])
            for (url, pnum, _), boxes in zip(ocr_jobs, results):
                if boxes is None:
                    continue  # OCR failed — typed failure lives doc-level
                idx = 0
                for text, conf in boxes:
                    if conf > OCR_MIN_CONFIDENCE and text.strip():
                        rows.append((url, pnum, idx, "ocr", None, text, float(conf)))
                        idx += 1
        yield pd.DataFrame(rows, columns=cols)


def kernel_route(
    pages_df: DataFrame,
    batch_fn,
    schema: StructType,
    key: str = "url",
    cols: tuple = ("url", "html"),
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """The shared plan shape of every kernel extraction route: scan
    pruned to ``cols`` → ONE salted repartition on ``xxhash64(key)``
    (bounds giant-payload skew; the job's single planned shuffle) → one
    python stage running ``batch_fn``.  Changing the salting key or the
    parallelism floor happens HERE, once, for all routes."""
    df = pages_df.select(*cols)
    if num_partitions is None:
        num_partitions = max(
            pages_df.sparkSession.sparkContext.defaultParallelism, 8
        )
    df = df.repartition(num_partitions, F.xxhash64(key))
    return df.mapInPandas(batch_fn, schema=schema)


def extract_blocks(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → block-level table: one row per layout block.

    Same plan shape as the document route — scan pruned to (url, html),
    one salted repartition, one python stage — so the blocks table scales
    exactly like the hot path."""
    return kernel_route(
        pages_df, extract_blocks_batch, BLOCK_SCHEMA,
        num_partitions=num_partitions,
    )


COMPOSITE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_num", IntegerType()),
        StructField("block_index", IntegerType()),
        StructField("kind", StringType()),  # 'table' | 'image'
        StructField("composite", StringType()),  # the v4 rendering string
    ]
)


def extract_composites_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Composite-block renderer (v4 semantics): per table/figure on a
    page, the reference's exact composite string —
    'table caption: …\\ntable body: …\\ntable footnote: …' /
    'image caption: …' (/root/reference/pdf_ocr_with_boxes_v4.py:232-260).
    Typing + association are geometric (ruled grids, draw bboxes,
    caption adjacency — kernels/pdf/layout.py); plain pages emit no rows."""
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf
    from pdf_ocr_spark.kernels.pdf.layout import composite_text

    _tune_worker_gc()
    cols = [f.name for f in COMPOSITE_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not looks_like_pdf(data):
                continue
            try:
                doc = extract_pdf(data)
            except Exception:  # noqa: BLE001 — poison-row isolation
                continue
            if doc.status != "ok":
                continue
            for page, idx, text in composite_text(doc.blocks):
                kind = "image" if text.startswith("image caption:") else "table"
                rows.append((url, page, idx, kind, text))
        yield pd.DataFrame(rows, columns=cols)


def extract_composites(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → composite-block table (v4): one row per
    table/figure with its rendered caption/body/footnote string.  Same
    plan shape as the other extraction routes."""
    return kernel_route(
        pages_df, extract_composites_batch, COMPOSITE_SCHEMA,
        num_partitions=num_partitions,
    )


RASTER_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_num", IntegerType()),
        StructField("raster_w", IntegerType()),
        StructField("raster_h", IntegerType()),
        StructField("ink_px", LongType()),
        StructField("raster_md5", StringType()),
    ]
)


def extract_rasters_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Page rasterizer route (runs on executors): renders every PDF page
    to the deterministic coverage bitmap (kernels/pdf/raster.py — the
    from-scratch twin of the reference's pdf_to_images,
    /root/reference/pdf_ocr_with_boxes_v3.py:144-158) and emits its
    dimensions, ink-pixel count, and full-bitmap digest.  One row per
    page; non-PDF and failed docs emit nothing (they carry no geometry)."""
    import hashlib

    from pdf_ocr_spark.kernels.pdf.content import interpret_page
    from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
    from pdf_ocr_spark.kernels.pdf.extract import MAX_PAGES
    from pdf_ocr_spark.kernels.pdf.raster import parse_pgm, rasterize_page

    _tune_worker_gc()
    cols = [f.name for f in RASTER_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not looks_like_pdf(data):
                continue
            try:
                doc = PDFDocument(data)
                for i, pd_ in enumerate(doc.pages()[:MAX_PAGES], 1):
                    res = interpret_page(doc, pd_)
                    pgm = rasterize_page(
                        res.glyphs, res.rules, res.image_draws,
                        res.width, res.height,
                        image_payloads=res.images,  # JPEG draws → real luma
                    )
                    w, h, px = parse_pgm(pgm)
                    rows.append(
                        (url, i, w, h, len(px) - px.count(255),
                         hashlib.md5(pgm).hexdigest())
                    )
            except Exception:  # noqa: BLE001 — poison-row isolation
                continue
        yield pd.DataFrame(rows, columns=cols)


ORIENTATION_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_num", IntegerType()),
        StructField("rotation", IntegerType()),   # 0 | 90 | 180 | 270 CCW
        StructField("n_upright", LongType()),     # flow-direction votes
        StructField("n_sideways", LongType()),
    ]
)


def detect_orientation_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """K4 orientation detection route (runs on executors): per PDF page,
    the content-based OSD verdict (dominant glyph flow direction — the
    digital-text analogue of the reference's Tesseract image_to_osd,
    /root/reference/parse_student_answers.py:40-59) plus the vote
    split.  extract_pdf applies the same verdict internally to
    re-orient rotated pages before layout; this route makes the
    detector itself observable/queryable."""
    from pdf_ocr_spark.kernels.pdf.content import dominant_rotation, interpret_page
    from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
    from pdf_ocr_spark.kernels.pdf.extract import MAX_PAGES

    _tune_worker_gc()
    cols = [f.name for f in ORIENTATION_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not looks_like_pdf(data):
                continue
            try:
                doc = PDFDocument(data)
                for i, pd_ in enumerate(doc.pages()[:MAX_PAGES], 1):
                    res = interpret_page(doc, pd_)
                    v = res.rot_votes
                    rows.append(
                        (url, i, dominant_rotation(v), v[0], v[1] + v[2] + v[3])
                    )
            except Exception:  # noqa: BLE001 — poison-row isolation
                continue
        yield pd.DataFrame(rows, columns=cols)


def detect_orientation(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → per-page orientation verdicts (K4).  Same
    plan shape as the other kernel routes."""
    return kernel_route(
        pages_df, detect_orientation_batch, ORIENTATION_SCHEMA,
        num_partitions=num_partitions,
    )


def extract_rasters(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → per-page raster table (S10): dimensions,
    ink coverage, and bitmap digest of the rendered page.  Same plan
    shape as the other extraction routes — scan pruned to (url, html),
    one salted repartition, one python stage."""
    return kernel_route(
        pages_df, extract_rasters_batch, RASTER_SCHEMA,
        num_partitions=num_partitions,
    )


HTML_TABLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("table_index", IntegerType()),
        StructField("caption", StringType()),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("tsv", StringType()),  # rows joined by \n, cells by \t
    ]
)


def extract_html_tables_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Structured <table> extractor (runs on executors): one row per
    HTML table with caption, shape, and row-major cells as TSV — the
    HTML twin of the PDF composite table blocks.  Non-HTML and
    poison rows emit nothing."""
    from pdf_ocr_spark.kernels.html_extract import extract_tables

    _tune_worker_gc()
    cols = [f.name for f in HTML_TABLE_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or looks_like_pdf(data):
                continue
            for t in extract_tables(data):
                rows.append(
                    (
                        url,
                        t.table_index,
                        t.caption,
                        t.n_rows,
                        t.n_cols,
                        "\n".join("\t".join(r) for r in t.rows),
                    )
                )
        yield pd.DataFrame(rows, columns=cols)


def extract_html_tables(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → HTML tables (url, table_index, caption,
    n_rows, n_cols, tsv).  Same plan shape as the other extraction
    routes: scan pruned to (url, html), one salted repartition, one
    python stage."""
    return kernel_route(
        pages_df, extract_html_tables_batch, HTML_TABLE_SCHEMA,
        num_partitions=num_partitions,
    )


HTML_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
        StructField("canonical", StringType()),
        StructField("lang", StringType()),
        StructField("og_title", StringType()),
        StructField("og_image", StringType()),
        StructField("published", StringType()),
        StructField("robots", StringType()),
    ]
)


def extract_html_meta_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Head-metadata extractor (runs on executors): one row per HTML
    page with title / description / canonical / lang / OpenGraph /
    publish date (trafilatura-style scan).  Non-HTML rows, poison rows,
    and payloads yielding NO metadata at all (e.g. a JPEG or zip that
    isn't HTML to begin with) emit nothing."""
    from pdf_ocr_spark.kernels.html_extract import extract_metadata

    _tune_worker_gc()
    cols = [f.name for f in HTML_META_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or looks_like_pdf(data):
                continue
            m = extract_metadata(data)
            if any(v is not None for v in m):
                rows.append((url, *m))
        yield pd.DataFrame(rows, columns=cols)


def extract_html_meta(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → head metadata (url, title, description,
    canonical, lang, og_title, og_image, published).  Same plan shape
    as the other extraction routes: scan pruned to (url, html), one
    salted repartition, one python stage."""
    return kernel_route(
        pages_df, extract_html_meta_batch, HTML_META_SCHEMA,
        num_partitions=num_partitions,
    )


JSONLD_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("block_index", IntegerType()),
        StructField("node_index", IntegerType()),
        StructField("ld_type", StringType()),
        StructField("name", StringType()),
        StructField("date_published", StringType()),
        StructField("valid", BooleanType()),
        StructField("raw_md5", StringType()),
    ]
)


def extract_jsonld_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Structured-data extractor (runs on executors): one row per
    schema.org JSON-LD entity node — @type, name/headline,
    datePublished, plus a valid flag so malformed embeds stay visible
    to coverage accounting.  Non-HTML and JSON-LD-free pages emit
    nothing."""
    from pdf_ocr_spark.kernels.html_extract import extract_jsonld

    _tune_worker_gc()
    cols = [f.name for f in JSONLD_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or looks_like_pdf(data):
                continue
            for b in extract_jsonld(data):
                rows.append((url, *b))
        yield pd.DataFrame(rows, columns=cols)


def extract_structured_data(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → JSON-LD entities (url, block_index,
    node_index, ld_type, name, date_published, valid, raw_md5).  Same
    single-shuffle plan shape as the other extraction routes."""
    return kernel_route(
        pages_df, extract_jsonld_batch, JSONLD_SCHEMA,
        num_partitions=num_partitions,
    )


HREFLANG_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("ord", IntegerType()),
        StructField("hreflang", StringType()),
        StructField("href", StringType()),
    ]
)


def extract_hreflang_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """hreflang extractor (runs on executors): one row per
    ``<link rel=alternate hreflang>`` annotation in document order —
    the cross-language page mapping a multilingual crawl clusters
    translations by.  Non-HTML and annotation-free pages emit
    nothing."""
    from pdf_ocr_spark.kernels.html_extract import extract_hreflang

    _tune_worker_gc()
    cols = [f.name for f in HREFLANG_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or looks_like_pdf(data):
                continue
            for i, (hreflang, href) in enumerate(extract_hreflang(data)):
                rows.append((url, i, hreflang, href))
        yield pd.DataFrame(rows, columns=cols)


def extract_hreflang_links(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → hreflang annotations (url, ord, hreflang,
    href).  Same single-shuffle plan shape as the other extraction
    routes."""
    return kernel_route(
        pages_df, extract_hreflang_batch, HREFLANG_SCHEMA,
        num_partitions=num_partitions,
    )


MICRODATA_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("item_index", IntegerType()),
        StructField("item_type", StringType()),
        StructField("prop", StringType()),
        StructField("value", StringType()),
        StructField("source", StringType()),
    ]
)


def extract_microdata_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Microdata extractor (runs on executors): one row per itemprop
    in the page's schema.org microdata trees — the attribute-based
    structured-data channel next to JSON-LD.  Non-HTML and
    microdata-free pages emit nothing."""
    from pdf_ocr_spark.kernels.html_extract import extract_microdata

    _tune_worker_gc()
    cols = [f.name for f in MICRODATA_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or looks_like_pdf(data):
                continue
            for p in extract_microdata(data):
                rows.append((url, *p))
        yield pd.DataFrame(rows, columns=cols)


def extract_microdata_rows(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → microdata property rows (url, item_index,
    item_type, prop, value, source) — same single-shuffle route shape
    as :func:`extract_structured_data`."""
    return kernel_route(
        pages_df, extract_microdata_batch, MICRODATA_SCHEMA,
        num_partitions=num_partitions,
    )


FORM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("field_index", IntegerType()),
        StructField("name", StringType()),       # fully-qualified (a.b)
        StructField("field_type", StringType()),  # Tx | Btn | Ch | Sig | ''
        StructField("value", StringType()),
    ]
)


def extract_forms_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """AcroForm field extractor (runs on executors): one row per
    terminal form field — data that never reaches the text layer when
    fields lack appearance streams.  Non-PDF and poison rows emit
    nothing."""
    from pdf_ocr_spark.kernels.pdf.forms import extract_form_fields

    _tune_worker_gc()
    cols = [f.name for f in FORM_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or not looks_like_pdf(data):
                continue
            for i, fld in enumerate(extract_form_fields(data)):
                rows.append((url, i, fld.name, fld.field_type, fld.value))
        yield pd.DataFrame(rows, columns=cols)


def extract_forms(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → AcroForm fields (url, field_index, name,
    field_type, value).  Same plan shape as every extraction route."""
    return kernel_route(
        pages_df, extract_forms_batch, FORM_SCHEMA,
        num_partitions=num_partitions,
    )


DOC_INFO_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("subject", StringType()),
        StructField("producer", StringType()),
        StructField("created", StringType()),
        StructField("modified", StringType()),
        StructField("n_pages", IntegerType()),
    ]
)

OUTLINE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("order", IntegerType()),
        StructField("level", IntegerType()),
        StructField("title", StringType()),
        StructField("page_num", IntegerType()),  # 1-based, -1 unresolvable
    ]
)


def extract_doc_info_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Trailer /Info metadata per PDF (title/author/dates + page count)
    — quality/dedup signals the content stream doesn't carry."""
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_doc_info

    _tune_worker_gc()
    cols = [f.name for f in DOC_INFO_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or not looks_like_pdf(data):
                continue
            rows.append((url, *extract_doc_info(data)))
        yield pd.DataFrame(rows, columns=cols)


def extract_outline_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Outline (bookmark) items per PDF — the document's own table of
    contents, the section-boundary signal for structure-aware chunking
    of long documents.  Outline-less PDFs emit nothing."""
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_outline

    _tune_worker_gc()
    cols = [f.name for f in OUTLINE_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or not looks_like_pdf(data):
                continue
            for it in extract_outline(data):
                rows.append((url, it.order, it.level, it.title, it.page_num))
        yield pd.DataFrame(rows, columns=cols)


def extract_doc_info(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    return kernel_route(
        pages_df, extract_doc_info_batch, DOC_INFO_SCHEMA,
        num_partitions=num_partitions,
    )


def extract_outline(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    return kernel_route(
        pages_df, extract_outline_batch, OUTLINE_SCHEMA,
        num_partitions=num_partitions,
    )


ANNOT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_num", IntegerType()),
        StructField("order", IntegerType()),
        StructField("subtype", StringType()),
        StructField("contents", StringType()),
        StructField("author", StringType()),
    ]
)


def extract_annots_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Comment-layer annotations per PDF (sticky notes, highlights with
    text, free-text remarks) — reviewer content the text layer never
    carries.  Link/Widget annots belong to the frontier/forms
    extractors; geometry-only markup is skipped."""
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_annotations

    _tune_worker_gc()
    cols = [f.name for f in ANNOT_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            if not data or not looks_like_pdf(data):
                continue
            for a in extract_annotations(data):
                rows.append(
                    (url, a.page_num, a.order, a.subtype, a.contents, a.author)
                )
        yield pd.DataFrame(rows, columns=cols)


def extract_annotations_route(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    return kernel_route(
        pages_df, extract_annots_batch, ANNOT_SCHEMA,
        num_partitions=num_partitions,
    )


LINK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("link", StringType()),
        StructField("link_index", IntegerType()),
        StructField("source_kind", StringType()),  # 'html' | 'pdf'
        StructField("nofollow", BooleanType()),  # rel=nofollow/ugc/sponsored
        StructField("anchor_text", StringType()),  # inner text, 200-char cap
    ]
)


def extract_links_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Crawl-frontier extractor: one row per outgoing hyperlink — HTML
    anchor hrefs (with the rel=nofollow/ugc/sponsored opt-out flag) plus
    PDF /Annots Link URIs, document order preserved."""
    from pdf_ocr_spark.kernels.html_extract import extract_links_attrs
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    _tune_worker_gc()
    cols = [f.name for f in LINK_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        for url, payload in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(payload) if payload is not None else b""
            try:
                if looks_like_pdf(data):
                    doc = extract_pdf(data)
                    if doc.status == "ok":
                        for i, u in enumerate(doc.links):
                            rows.append((url, u, i, "pdf", False, ""))
                else:
                    for i, (u, nf, at) in enumerate(extract_links_attrs(data)):
                        rows.append((url, u, i, "html", nf, at))
            except Exception:  # noqa: BLE001 — poison-row isolation
                continue
        yield pd.DataFrame(rows, columns=cols)


def extract_links(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """pages(url, html, …) → outgoing-link edges (url, link, index,
    source_kind) — same plan shape as the other extraction routes."""
    return kernel_route(
        pages_df, extract_links_batch, LINK_SCHEMA,
        num_partitions=num_partitions,
    )


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
        F.sum(F.when(F.col("needs_ocr"), 1).otherwise(0))
        .cast("int")
        .alias("n_ocr_pages"),  # range route keeps needs_ocr as was-OCR marker
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
        F.when(F.col("status") == "failed", F.lit(0))
        .otherwise(F.coalesce(F.col("n_blocks"), F.lit(0)))
        .alias("n_blocks"),
        F.coalesce(F.length(extracted), F.lit(0)).alias("n_chars"),
        "status",
        "failure_reason",
        "n_bytes",
        F.when(F.col("status") == "failed", F.lit(0))
        .otherwise(F.col("n_ocr_pages"))
        .cast("int")
        .alias("n_ocr_pages"),
    )


def extract_documents(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """Full pipeline: pages table → document-level extraction results.

    Physical plan: scan → repartition(P, xxhash64(url)) → ONE fused
    mapInArrow stage (parse + batched OCR + per-doc assembly).  A single
    shuffle total; no groupBy, no second Arrow round-trip, no pandas
    layer in the worker."""
    df = pages_df.select("url", "html")
    if num_partitions is None:
        num_partitions = max(pages_df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartition(num_partitions, F.xxhash64("url"))
    return df.mapInArrow(extract_docs_arrow, schema=DOC_SCHEMA)


def extract_documents_paged(
    pages_df: DataFrame, num_partitions: Optional[int] = None
) -> DataFrame:
    """Page-level route (extract → OCR stage → groupBy assemble).  Kept
    for the page-table API and as the semantics oracle for the fused
    path — tests assert both produce identical rows."""
    return assemble_documents(extract_pages(pages_df, num_partitions))


RANGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_pages", IntegerType()),
    ]
)


def count_pages_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Cheap structural pass over giant PDFs: page count only (xref +
    page-tree walk, no content decode)."""
    from pdf_ocr_spark.kernels.pdf.extract import count_pdf_pages

    _tune_worker_gc()
    for pdf_batch in batches:
        yield pd.DataFrame(
            {
                "url": pdf_batch["url"],
                "n_pages": [
                    count_pdf_pages(bytes(p) if p is not None else b"")
                    for p in pdf_batch["html"]
                ],
            }
        )


def extract_range_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Page-range extractor for giant documents: each input row is
    (url, html, page_lo, page_hi); emits PAGE_SCHEMA rows with GLOBAL page
    numbers.  OCR runs inline (batched) like the fused extractor;
    ``needs_ocr`` is kept True on OCR'd rows as a was-OCR marker for
    lineage (the text is already filled in)."""
    from pdf_ocr_spark.kernels.ocr_stub import get_engine, ocr_page_text
    from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

    _tune_worker_gc()
    engine = None
    cols = [f.name for f in PAGE_SCHEMA.fields]
    for pdf_batch in batches:
        rows = []
        ocr_slots = []  # (row_idx, payload)
        for url, payload, lo, hi in zip(
            pdf_batch["url"], pdf_batch["html"],
            pdf_batch["page_lo"], pdf_batch["page_hi"],
        ):
            data = bytes(payload) if payload is not None else b""
            n_bytes = len(data)
            try:
                doc = extract_pdf(data, int(lo), int(hi))
                if doc.status != "ok":
                    rows.append((url, "pdf", 0, None, 0, False, None,
                                 "failed", doc.failure_reason, n_bytes))
                    continue
                for p in doc.pages:
                    if p.needs_ocr:
                        ocr_slots.append((len(rows), p.ocr_payload))
                        rows.append([url, "pdf", p.page_num, None, p.n_blocks,
                                     True, None, "ok", None, n_bytes])
                    else:
                        rows.append((url, "pdf", p.page_num, p.text, p.n_blocks,
                                     False, None, "ok", None, n_bytes))
            except Exception as e:  # noqa: BLE001
                rows.append((url, "pdf", 0, None, 0, False, None,
                             "failed", f"kernel_crash: {type(e).__name__}", n_bytes))
        if ocr_slots:
            if engine is None:
                engine = get_engine()
            results = engine.recognize_batch([p for _, p in ocr_slots])
            for (ri, _), boxes in zip(ocr_slots, results):
                text = ocr_page_text(boxes)
                if text is None:  # engine failure marker → typed failure
                    rows[ri][7] = "failed"
                    rows[ri][8] = OCR_FAILED_REASON
                else:
                    rows[ri][3] = text
        yield pd.DataFrame(rows, columns=cols)


def extract_documents_split(
    pages_df: DataFrame,
    num_partitions: Optional[int] = None,
    giant_bytes: int = 4 << 20,
    pages_per_task: int = 32,
) -> DataFrame:
    """Skew-bounded variant of :func:`extract_documents` for corpora with
    GIANT documents (SURVEY.md §4.1: "a 1000-page PDF blocks the loop
    exactly like a 1-pager").

    Normal rows (payload < ``giant_bytes``) take the fused single-stage
    path.  Giant rows get a two-phase treatment: a cheap page-count pass,
    then an explode into (url, page_lo, page_hi) range rows of
    ``pages_per_task`` pages each — so a 5000-page document becomes ~150
    independent tasks instead of one straggler — and a groupBy(url)
    re-merge.  The split threshold is by payload size (known before any
    parse), the split unit by page count (known after the cheap pass)."""
    spark = pages_df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    src = pages_df.select("url", "html")
    # null-safe: NULL html must take the normal path (extract_documents
    # emits its typed failure row) — a bare length() >= N predicate is NULL
    # for NULL payloads and silently drops the row from BOTH branches
    is_giant = F.coalesce(F.length("html"), F.lit(0)) >= giant_bytes

    normal_docs = extract_documents(src.filter(~is_giant), num_partitions)

    giants = src.filter(is_giant)
    # counts (url, n_pages — tiny) feeds BOTH the ranges join and the
    # failed-giants join; without a persist the expensive count pass (full
    # structural parse over every multi-MB giant) executes once per
    # consumer.  Registered for release by the NEXT call (or an explicit
    # release_split_cache()) so repeated runs hold at most one cache.
    release_split_cache()
    counts = giants.mapInPandas(count_pages_batch, schema=RANGE_SCHEMA).persist()
    _live_split_caches.append(counts)
    ranges = (
        giants.join(counts, "url")
        .filter(F.col("n_pages") > 0)
        .select(
            "url",
            "html",
            F.explode(
                F.sequence(F.lit(1), F.col("n_pages"), F.lit(pages_per_task))
            ).alias("page_lo"),
        )
        .withColumn("page_hi", F.col("page_lo") + F.lit(pages_per_task - 1))
    )
    page_rows = ranges.repartition(
        num_partitions, F.xxhash64("url", "page_lo")
    ).mapInPandas(extract_range_batch, schema=PAGE_SCHEMA)
    # failed count-pass giants (n_pages == 0) still need a failure row
    failed_giants = (
        giants.join(counts, "url")
        .filter(F.col("n_pages") <= 0)
        .select("url", "html")
    )
    giant_docs = assemble_documents(page_rows).unionByName(
        extract_documents(failed_giants, num_partitions)
    )
    return normal_docs.unionByName(giant_docs)


def lineage_metrics(
    page_rows: DataFrame, deterministic_buckets: Optional[int] = None
) -> DataFrame:
    """Per-partition lineage/metrics sidecar rows (north rule): input
    split id, doc & page counts, byte counts, failure-reason histogram.
    Mirrors the reference's summary JSON
    (/root/reference/pdf_ocr_with_boxes_v3.py:413-428) but per partition
    and queryable.

    ``deterministic_buckets=B`` replaces the physical partition id with a
    url-content bucket (first 8 hex chars of md5(url) mod B) — the rows
    then no longer depend on partitioning/AQE at all and value-hash
    against an engine-independent replay (both Spark and DuckDB compute
    the identical md5 bucket).  Production jobs keep the default physical
    id: lineage's job is to name the actual split that produced the rows."""
    if deterministic_buckets is not None:
        pid = (
            F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10)
            .cast("long") % deterministic_buckets
        )
    else:
        pid = F.spark_partition_id()
    return (
        page_rows.withColumn("part_id", pid)
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


def dedup_extracted(docs: DataFrame, mark_only: bool = False) -> DataFrame:
    """Post-extraction exact dedup: keep one canonical document per
    normalized-text fingerprint (min url wins — deterministic).  The
    training-data cleanup step chained after extraction: crawl → extract
    → dedup → clean corpus.

    One shuffle on the fingerprint; failed rows (no text) pass through
    untouched.  ``mark_only=True`` keeps every row and adds
    ``is_canonical`` instead of filtering (lets downstream decide)."""
    from pdf_ocr_spark.operators.dedup import normalized

    fp = F.when(
        F.col("status") == "ok", F.md5(normalized(F.col("extracted_text")))
    )
    w = Window.partitionBy(fp).orderBy("url")
    marked = docs.withColumn(
        "is_canonical",
        fp.isNull() | (F.row_number().over(w) == 1),
    )
    if mark_only:
        return marked
    return marked.filter(F.col("is_canonical")).drop("is_canonical")


def dedup_incremental(
    new_docs: DataFrame,
    history: Optional[DataFrame] = None,
    mark_only: bool = False,
) -> DataFrame:
    """Cross-RUN content dedup — the streaming-crawl pattern where each
    appended batch must not duplicate anything already committed: drop
    new docs whose normalized-text fingerprint exists in ``history``
    (the snapshot table), then exact-dedup within the batch
    (:func:`dedup_extracted`).  Failed rows (null fingerprint) always
    pass through — a null key never matches the anti-join.

    Scale: at 10^12 docs the history fingerprints are corpus-sized, so
    the anti-join is a sort-merge shuffle on the fingerprint; writing
    the table ``bucketBy(fp)`` (see tests/test_bucketed_join.py) makes
    the history side exchange-free on every subsequent append."""
    from pdf_ocr_spark.operators.dedup import normalized

    if history is not None:
        hist_fp = (
            history.filter(F.col("status") == "ok")
            .select(F.md5(normalized(F.col("extracted_text"))).alias("fp"))
            .distinct()
        )
        fp = F.when(
            F.col("status") == "ok", F.md5(normalized(F.col("extracted_text")))
        )
        new_docs = (
            new_docs.withColumn("_fp", fp)
            .join(hist_fp, F.col("_fp") == F.col("fp"), "left_anti")
            .drop("_fp")
        )
    return dedup_extracted(new_docs, mark_only=mark_only)


def input_split_lineage(pages_df: DataFrame) -> DataFrame:
    """Input-split lineage: which INPUT FILE contributed which urls —
    (input_file, n_rows, n_bytes, min_url, max_url), joinable by url
    range to per-partition failure metrics for forensics ('which crawl
    segment broke').  Computed on the scan side (``input_file_name()``
    is empty after an exchange, so this runs as its own pass, not
    through the fused kernel — the hot path's schema stays untouched);
    file-scan sources only (empty for in-memory pages)."""
    return (
        pages_df.select(
            F.input_file_name().alias("input_file"),
            "url",
            F.coalesce(F.length("html"), F.lit(0)).alias("_n"),
        )
        .filter(F.col("input_file") != "")
        .groupBy("input_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_n").alias("n_bytes"),
            F.min("url").alias("min_url"),
            F.max("url").alias("max_url"),
        )
    )


def doc_lineage_metrics(doc_rows: DataFrame) -> DataFrame:
    """Per-partition lineage sidecar over FUSED doc rows (the hot path's
    sidecar): same contract as :func:`lineage_metrics` but sourced from
    document-level output, so no page table needs materializing."""
    return (
        doc_rows.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum("n_ocr_pages").alias("n_ocr_pages"),
            F.sum("n_bytes").alias("n_bytes"),
            F.array_sort(
                F.collect_set(F.split(F.col("failure_reason"), ":").getItem(0))
            ).alias("failure_kinds"),
        )
    )


def resume_filter(
    input_df: DataFrame,
    completed_urls: DataFrame,
    retry_transient: bool = True,
) -> DataFrame:
    """J3 resume anti-join: drop rows whose url is already committed.

    On Iceberg this reads the last committed snapshot; here, the output
    parquet dir.  One line, but it is what makes a 10^12-doc run
    restartable (north rule).

    ``retry_transient``: committed rows whose only outcome is a TRANSIENT
    failure (``ocr_failed: …`` — remote engine error after retries) do NOT
    count as completed, so the next run reprocesses them; permanent
    failures (parse errors) stay committed.  A retried url that later
    succeeds appends an ok row alongside the old failed row — at-least-once
    semantics; downstream readers canonicalize via :func:`canonical_docs`
    (status priority, total deterministic tie-break; on real Iceberg,
    MERGE INTO replaces the failed row atomically instead)."""
    done = completed_urls
    if retry_transient and "failure_reason" in done.columns:
        done = done.filter(
            F.coalesce(
                ~F.col("failure_reason").startswith("ocr_failed"), F.lit(True)
            )
        )
    return input_df.join(done.select("url"), "url", "left_anti")


def canonical_docs(docs: DataFrame) -> DataFrame:
    """Reader-side canonicalization for the at-least-once append model
    (:func:`resume_filter`): a retried transient failure appends an ok
    row ALONGSIDE the old ``ocr_failed`` row, so readers pick ONE row
    per url — ok beats failed, then the larger (n_chars, n_ocr_pages,
    n_bytes, failure_reason, extracted_text) wins, every key coalesced
    non-null so the order is total and deterministic.

    Plan: one groupBy(url) with ``max_by`` — single shuffle, map-side
    partial aggregation, no window over the whole table; scales to the
    10^12-doc table (url is the natural high-cardinality key).  On real
    Iceberg a ``MERGE INTO`` at retry-commit time replaces the failed
    row instead and this becomes a no-op."""
    cols = [c for c in docs.columns if c != "url"]
    key = F.struct(
        F.when(F.col("status") == "ok", 1).otherwise(0).alias("pri"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("k1"),
        F.coalesce(F.col("n_ocr_pages"), F.lit(0)).alias("k2"),
        F.coalesce(F.col("n_bytes"), F.lit(0)).alias("k3"),
        F.coalesce(F.col("failure_reason"), F.lit("")).alias("k4"),
        F.coalesce(F.col("extracted_text"), F.lit("")).alias("k5"),
        # remaining fields so the order is TOTAL (max_by with tied keys
        # would otherwise be partition-order-dependent)
        F.coalesce(F.col("content_kind"), F.lit("")).alias("k6"),
        F.coalesce(F.col("n_pages"), F.lit(0)).alias("k7"),
        F.coalesce(F.col("n_blocks"), F.lit(0)).alias("k8"),
    )
    best = docs.groupBy("url").agg(
        F.max_by(F.struct(*[F.col(c) for c in cols]), key).alias("_best")
    )
    return best.select("url", *[F.col(f"_best.{c}").alias(c) for c in cols])


def read_pages(
    spark: SparkSession, input_path: str, input_format: str = "parquet"
) -> DataFrame:
    """Input-side dispatch: the pages table from parquet/Iceberg-style
    storage, straight from raw WARC/WET crawl segments, or from JSONL
    crawl dumps (``{"url": ..., "html_b64": ...}`` per line — the
    sidecar format crawl tooling commonly emits; html is base64 because
    JSON can't carry raw bytes).  An explicit schema keeps the JSONL
    scan single-pass (no sampling inference job) and prunable."""
    if input_format == "warc":
        from pdf_ocr_spark.sources.warc import warc_to_pages

        return warc_to_pages(spark, input_path)
    if input_format == "jsonl":
        raw = spark.read.schema("url string, html_b64 string").json(input_path)
        return raw.select("url", F.unbase64("html_b64").alias("html"))
    return spark.read.parquet(input_path)


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    sidecar_path: Optional[str] = None,
    num_partitions: Optional[int] = None,
    partition_buckets: Optional[int] = None,
    split_giants: bool = False,
    giant_bytes: int = 4 << 20,
    input_format: str = "parquet",
) -> int:
    """Checkpointable batch run: resume → extract → append-commit.

    ``partition_buckets``: Iceberg-style ``bucket(url)`` layout — the
    output is hive-partitioned on ``url_bucket = xxhash64(url) % N`` so a
    resume scan, a per-bucket compaction, or a downstream co-located join
    can prune to single buckets.  Returns the number of documents APPENDED
    by this invocation (0 on a fully-resumed no-op run) — no full re-scan
    of the output table, which at 10^12 docs would cost more than the
    incremental run itself."""
    pages = read_pages(spark, input_path, input_format)
    if _parquet_exists(output_path):
        done = spark.read.parquet(output_path)
        pages = resume_filter(pages, done)
    if split_giants:
        docs = extract_documents_split(pages, num_partitions, giant_bytes=giant_bytes)
    else:
        docs = extract_documents(pages, num_partitions)
    if partition_buckets:
        docs = docs.withColumn(
            "url_bucket",
            F.pmod(F.xxhash64("url"), F.lit(partition_buckets)).cast("int"),
        )
    # the extractor is expensive: materialize doc rows once, derive the
    # count, sidecar, and main table from the cached result (SURVEY.md §4.2
    # double-execution caveat).  ORDER MATTERS: the resume plan reads
    # output_path, so appending to it invalidates this cache — everything
    # that consumes `docs` must run BEFORE the main-table write.  The
    # sidecar therefore commits first (an orphan sidecar entry after a
    # mid-write crash is harmless lineage; on real Iceberg both writes
    # share one transaction).
    docs = docs.persist()
    try:
        n = docs.count()  # materializes the cache; appended count, no rescan
        if sidecar_path is not None:
            doc_lineage_metrics(docs).withColumn(
                "run_output", F.lit(output_path)
            ).write.mode("append").parquet(sidecar_path)
        writer = docs.write.mode("append")
        if partition_buckets:
            writer = writer.partitionBy("url_bucket")
        writer.parquet(output_path)
    finally:
        docs.unpersist()
    return n


def _parquet_exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    return any(
        name.endswith(".parquet") or name == "_SUCCESS" for name in os.listdir(path)
    )

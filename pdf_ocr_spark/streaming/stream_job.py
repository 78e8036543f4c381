"""Structured Streaming surface of the extraction engine.

The reference is a batch tool (SURVEY.md §1.3), but a web-scale crawl is
an unbounded source: new WARC-derived parquet files land continuously.
This module re-expresses the batch pipeline as an incremental streaming
job — same kernels, same fused ``mapInArrow`` stage — where Spark's
checkpoint tracks which input files are already processed (the streaming
twin of the batch resume anti-join, ``extract_job.resume_filter``):

* :func:`stream_extract` — file-source ``readStream`` over the pages
  table → fused extractor → parquet ``writeStream``.  With
  ``Trigger.AvailableNow`` it drains everything new and stops, giving
  exactly-once incremental batches driven entirely by the checkpoint.
* :func:`windowed_event_counts` — watermarked tumbling-window counts
  (late data handled by the watermark), the streaming analogue of the
  hourly-rollup batch query.
* :func:`running_totals_stateful` — ``applyInPandasWithState`` custom
  stateful operator: running per-group totals that survive across
  micro-batches (SURVEY.md §2.10 / task-spec "applyInPandasWithState
  for custom stateful operators").
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pdf_ocr_spark.pipeline.extract_job import DOC_SCHEMA, extract_docs_arrow

#: schema of the Common-Crawl-style pages table (BASELINE.json input_hint)
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    num_partitions: Optional[int] = None,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
    ignore_corrupt_files: bool = True,
):
    """Incremental extraction: new parquet files under ``input_path`` flow
    through the SAME fused extractor as the batch job and append to
    ``output_path``.  Returns the started StreamingQuery.

    The checkpoint (file-source log + sink commit log) is the resume
    protocol: a killed run restarts from the last committed micro-batch
    with no anti-join needed and no double-processing."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if ignore_corrupt_files:
        # a crawl WILL contain truncated/garbage files; one must not kill
        # the stream (probed: without this, the query terminates)
        reader = reader.option("ignoreCorruptFiles", "true")
    pages = reader.parquet(input_path)

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    docs = (
        pages.select("url", "html")
        .repartition(num_partitions, F.xxhash64("url"))
        .mapInArrow(extract_docs_arrow, schema=DOC_SCHEMA)
    )

    writer = (
        docs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup over a (streaming or batch)
    events frame with columns (ts timestamp, event_type string,
    value double).  Late rows beyond the watermark are dropped; state for
    closed windows is reclaimed — this is what keeps the operator's state
    bounded on an unbounded 100 TB/day stream."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ: watermarks need instants
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST document per normalized-text
    fingerprint inside the watermark horizon
    (``dropDuplicatesWithinWatermark`` — the streaming twin of the batch
    ``dedup_extracted`` stage).  Dedup state ages out with the watermark,
    which is what keeps it bounded on an unbounded crawl: an exact
    re-crawl of a page weeks later is deduplicated by the BATCH pass over
    the accumulated table, not by streaming state."""
    from pdf_ocr_spark.operators.dedup import normalized

    return (
        docs.withColumn("fingerprint", F.md5(normalized(F.col(text_col))))
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def stream_incremental_dedup(
    docs: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming cross-snapshot dedup: continuous crawl ingestion
    filtered against the STATIC historical fingerprint store (the
    streaming twin of ``operators.dedup.incremental_dedup``), then
    first-sighting dedup within the stream's watermark horizon.

    The history check is a stream-static LEFT ANTI join — Spark
    re-plans the static side per micro-batch, so appending the batch
    pass's new fingerprints to the store takes effect on the next
    trigger without restarting the query.  At crawl scale the store is
    a parquet/Iceberg table partitioned by fingerprint prefix: each
    micro-batch's join prunes to the buckets its fingerprints touch.
    Within-stream duplicates are handled by
    ``dropDuplicatesWithinWatermark`` — state stays watermark-bounded
    on an unbounded stream."""
    from pdf_ocr_spark.operators.dedup import normalized

    seen = seen_fingerprints.select("fingerprint")
    return (
        docs.withColumn("fingerprint", F.md5(normalized(F.col(text_col))))
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .join(seen, "fingerprint", "left_anti")
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


_STATE_SCHEMA = StructType(
    [StructField("n_docs", LongType()), StructField("n_bytes", LongType())]
)
_TOTALS_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def _totals_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running totals per key, kept in GroupState across micro-batches."""
    n_docs, n_bytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n_docs += len(pdf)
        n_bytes += int(pdf["n_bytes"].sum())
    state.update((n_docs, n_bytes))
    yield pd.DataFrame(
        {"lang": [key[0]], "n_docs": [n_docs], "n_bytes": [n_bytes]}
    )


def running_totals_stateful(pages: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: cumulative per-lang doc/byte
    totals via ``applyInPandasWithState``.  Input needs columns
    (lang string, n_bytes long); each micro-batch emits the updated
    running totals for the langs it touched."""
    return pages.groupBy("lang").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_feed_frontier(
    spark: SparkSession,
    feeds_path: str,
    output_path: str,
    checkpoint_path: str,
    num_partitions: Optional[int] = None,
    available_now: bool = True,
):
    """Streaming frontier discovery from feeds — the operational loop a
    crawler runs continuously: new feed documents (parquet files of
    (url, body)) land under ``feeds_path``, their RSS/Atom items parse
    through the SAME kernel as the batch route, and
    ``dropDuplicatesWithinWatermark`` on the discovered link keeps each
    url's FIRST sighting only, so the downstream fetch queue never
    double-enqueues.  The checkpoint is the resume protocol, exactly as
    in :func:`stream_extract`.  Returns the started StreamingQuery.

    State stays bounded: the watermark ages out link-dedup state after
    a day — re-discoveries beyond that are acceptable (the fetch loop's
    snapshot-table anti-join is the durable guard)."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from pdf_ocr_spark.operators.frontier import _feed_items_batch, FEED_ITEM_SCHEMA

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("body", BinaryType()),
            StructField("fetched_at", TimestampType()),
        ]
    )
    feeds = (
        spark.readStream.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(feeds_path)
    )
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    items = (
        feeds.select("url", "body", "fetched_at")
        .repartition(num_partitions, F.xxhash64("url"))
        .mapInPandas(
            _stream_feed_batch,
            # a LOCAL schema: StructType.add mutates the receiver, and
            # FEED_ITEM_SCHEMA is the shared batch-route schema
            schema=StructType(
                list(FEED_ITEM_SCHEMA.fields)
                + [StructField("fetched_at", TimestampType())]
            ),
        )
        .withWatermark("fetched_at", "1 day")
        .dropDuplicatesWithinWatermark(["link"])
    )
    writer = (
        items.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _stream_feed_batch(batches):
    """Feed-parse kernel for the streaming route: same parser as the
    batch ``_feed_items_batch``, carrying the fetch timestamp through
    for the watermark."""
    import pandas as pd

    from pdf_ocr_spark.kernels.robots import parse_feed

    for batch in batches:
        rows = []
        for url, body, ts in zip(batch["url"], batch["body"], batch["fetched_at"]):
            try:
                for link, title, date in parse_feed(
                    bytes(body) if body is not None else b""
                ):
                    rows.append((url, link, title, date, ts))
            except Exception:  # noqa: BLE001
                continue
        yield pd.DataFrame(
            rows, columns=["feed", "link", "title", "date", "fetched_at"]
        )


#: DOC_SCHEMA plus the input row's capture timestamp, passed through the
#: extractor 1:1 (``_parse_batch`` emits exactly one doc row per input
#: row, in input order) — WET conversion records must carry the ORIGINAL
#: WARC-Date of the capture they convert, like Common Crawl's WET product.
DOC_TS_SCHEMA = StructType(
    list(DOC_SCHEMA.fields) + [StructField("warc_ts", TimestampType())]
)


def extract_docs_with_ts_arrow(batches):
    """Arrow extractor over (url, warc_ts, html) batches: the fused
    extractor's output columns plus the untouched per-row ``warc_ts``.
    No join needed — the kernel's 1:1 input-order contract makes the
    timestamp a pure column pass-through (zero extra shuffle, unlike a
    join-back-by-url inside every micro-batch)."""
    import pyarrow as pa

    from pdf_ocr_spark.pipeline.extract_job import _parse_batch, _tune_worker_gc

    _tune_worker_gc()
    engine = None
    types = (
        pa.string(), pa.string(), pa.string(), pa.int32(), pa.int32(),
        pa.int32(), pa.string(), pa.string(), pa.int64(), pa.int32(),
    )
    names = [f.name for f in DOC_SCHEMA.fields] + ["warc_ts"]
    for rb in batches:
        rows, engine = _parse_batch(
            rb.column(0).to_pylist(), rb.column(2).to_pylist(), engine
        )
        cols = list(zip(*rows)) if rows else [[] for _ in types]
        arrays = [pa.array(c, t) for c, t in zip(cols, types)]
        arrays.append(rb.column(1))
        yield pa.record_batch(arrays, names=names)


def stream_wet_export(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    num_partitions: Optional[int] = None,
):
    """Streaming WET export — the continuous-publication twin of the
    batch ``sink_wet_export`` product: every micro-batch of newly
    landed pages runs the SAME fused extractor, and its non-empty
    extracted texts land as conversion-record WARC (WET) archives, one
    archive per partition per batch, each stamped with the page's REAL
    capture timestamp (``warc_ts`` threaded through the extractor) so
    the conversion records keep the original WARC-Date like Common
    Crawl's WET product; null capture timestamps render as the epoch
    (``pages_to_warc``'s null contract).

    ``foreachBatch`` is the pattern for sinks Spark has no streaming
    writer for (a custom archive format); idempotence comes from
    writing each batch into its own ``batch=<id>`` subdirectory with
    mode=overwrite — a retried micro-batch overwrites its own output
    instead of appending duplicates, so checkpoint + directory layout
    together give exactly-once archives.  Returns the started query."""
    import os as _os

    from pdf_ocr_spark.sources.warc import pages_to_warc

    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "ignoreCorruptFiles", "true"
    )
    pages = reader.parquet(input_path)
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    docs = (
        pages.select("url", "warc_ts", "html")
        .repartition(num_partitions, F.xxhash64("url"))
        .mapInArrow(extract_docs_with_ts_arrow, schema=DOC_TS_SCHEMA)
    )

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        wet_in = (
            batch_df.filter(F.length("extracted_text") > 0)
            .select(
                "url",
                "warc_ts",
                F.lit(None).cast("binary").alias("html"),
                F.col("extracted_text").alias("text"),
                F.lit("unknown").alias("lang"),
            )
        )
        pages_to_warc(wet_in).write.mode("overwrite").parquet(
            _os.path.join(output_path, f"batch={batch_id}")
        )

    return (
        docs.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_gate(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    model_rows,
    threshold: float,
    buckets: int = 4096,
    num_partitions: Optional[int] = None,
):
    """Streaming quality gate — the continuous twin of the batch
    ``quality_nb_score`` + quota cut (the FineWeb-edu deployment shape:
    the classifier trains OFFLINE on the curated reference, then gates
    every newly crawled page online): each micro-batch of landed pages
    runs the fused extractor, the extracted text is scored with the
    frozen NB weight table (``model_rows`` — the collected broadcast
    model, rebuilt per batch so the stream carries no JVM state), and
    only rows with ``nb_score > threshold`` land.

    The threshold is a FIXED offline-calibrated constant, not a
    per-batch quantile — a per-batch cut would make row fate depend on
    micro-batch boundaries, breaking the retry-idempotence contract.
    ``foreachBatch`` + per-batch ``batch=<id>`` overwrite directories
    give exactly-once output exactly like ``stream_wet_export``.
    Returns the started query."""
    import os as _os

    from pdf_ocr_spark.operators.quality import nb_score

    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "ignoreCorruptFiles", "true"
    )
    pages = reader.parquet(input_path)
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    docs = (
        pages.select("url", "html")
        .repartition(num_partitions, F.xxhash64("url"))
        .mapInArrow(extract_docs_arrow, schema=DOC_SCHEMA)
    )
    model_local = [
        (int(r[0]), int(r[1]), int(r[2]), r[3]) for r in model_rows
    ]

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        model = sess.createDataFrame(
            model_local,
            schema="bucket int, pos_cnt long, neg_cnt long, weight decimal(18,6)",
        )
        scored = nb_score(
            batch_df, model, text_col="extracted_text", id_col="url",
            buckets=buckets,
        )
        kept = (
            batch_df.join(scored, "url")
            .filter(F.col("nb_score") > threshold)
            .select("url", "extracted_text", "nb_score")
        )
        kept.write.mode("overwrite").parquet(
            _os.path.join(output_path, f"batch={batch_id}")
        )

    return (
        docs.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stream_hot_hosts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    d: int = 3,
    w: int = 64,
):
    """Streaming heavy-hitter sketch over arriving pages: every
    micro-batch builds its own Count-Min counter table for the batch's
    HOSTS (bounded: ≤ d·w rows per batch no matter the traffic) and
    writes it into a ``batch=<id>`` subdirectory with mode=overwrite —
    the ``stream_wet_export`` exactly-once pattern: a retried
    micro-batch overwrites its own output instead of double-counting,
    which is precisely the failure mode a naive streaming counter
    accumulator has (at-least-once replay inflates counts; a FIXED
    per-batch sketch directory cannot).

    The live "who is hot right now" view is :func:`merged_host_sketch`
    — CMS mergeability (groupBy sum over the batch dirs) means the
    sketch state is an append-only directory tree, never a mutable
    aggregate.  Returns the started query."""
    from pdf_ocr_spark.operators.graph import host_expr
    from pdf_ocr_spark.operators.sketches import cms_counts

    reader = spark.readStream.schema(PAGES_SCHEMA).option(
        "ignoreCorruptFiles", "true"
    )
    pages = reader.parquet(input_path)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        sk = cms_counts(
            batch_df.select(host_expr(F.col("url")).alias("item")).filter(
                F.col("item") != ""
            ),
            "item",
            d=d,
            w=w,
        )
        sk.coalesce(1).write.mode("overwrite").parquet(
            f"{output_path}/batch={batch_id}"
        )

    return (
        pages.writeStream.foreachBatch(_emit)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def merged_host_sketch(spark: SparkSession, output_path: str) -> DataFrame:
    """The read-side merge of :func:`stream_hot_hosts` batch dirs: one
    groupBy sum over ≤ d·w rows per batch — the CMS merge property.
    Point-query it with :func:`sketches.cms_estimate`."""
    return (
        spark.read.parquet(output_path)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )

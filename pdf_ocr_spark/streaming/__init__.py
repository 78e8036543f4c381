from pdf_ocr_spark.streaming.stream_job import (  # noqa: F401
    PAGES_SCHEMA,
    running_totals_stateful,
    stream_dedup_exact,
    stream_extract,
    stream_incremental_dedup,
    stream_quality_gate,
    stream_wet_export,
    windowed_event_counts,
)

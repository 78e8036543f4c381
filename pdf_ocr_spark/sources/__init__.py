from pdf_ocr_spark.sources.warc import (  # noqa: F401
    iter_warc_records,
    warc_to_pages,
)

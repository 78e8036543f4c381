"""Freeze the html-tables golden: run the structured <table> extractor
kernel (no Spark) over the deterministic table-HTML corpus and write the
expected rows to ``pdf_ocr_spark/fixtures/html_tables_golden.parquet``.

The registry query ``html_tables`` recomputes the same rows through the
distributed pipeline (``extract_html_tables``); its DuckDB oracle reads
this parquet.

Rerun (and commit the result) only when table-extraction semantics
intentionally change:  python tools/freeze_html_tables_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_html_table_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_html_tables_batch  # noqa: E402

N_DOCS = 40  # must match q_html_tables

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "html_tables_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_html_table_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(
        list(extract_html_tables_batch(iter([batch]))), ignore_index=True
    )
    return out.sort_values(
        ["url", "table_index"], kind="mergesort"
    ).reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} html-table rows -> {OUT}")

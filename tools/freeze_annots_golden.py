"""Freeze the pdf-annotations golden: run the comment-layer extractor
kernel (no Spark) over the deterministic annotations corpus; the
``pdf_annotations`` registry query recomputes the rows through the
distributed route and its DuckDB oracle reads this parquet.

Rerun (and commit) only on intentional semantic change:
  python tools/freeze_annots_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_annot_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_annots_batch  # noqa: E402

N_DOCS = 36  # must match q_pdf_annotations

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "pdf_annotations_golden.parquet",
)

if __name__ == "__main__":
    rows = gen_annot_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    df = pd.concat(
        list(extract_annots_batch(iter([batch]))), ignore_index=True
    ).sort_values(["url", "order"], kind="mergesort").reset_index(drop=True)
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} annotation rows -> {OUT}")

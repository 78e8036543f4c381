"""Freeze the pdf-forms golden: run the AcroForm extractor kernel (no
Spark) over the deterministic forms corpus and write the expected rows
to ``pdf_ocr_spark/fixtures/pdf_forms_golden.parquet``.

The registry query ``pdf_forms`` recomputes the same rows through the
distributed pipeline (``extract_forms``); its DuckDB oracle reads this
parquet.

Rerun (and commit the result) only when form semantics intentionally
change:  python tools/freeze_forms_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_form_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_forms_batch  # noqa: E402

N_DOCS = 36  # must match q_pdf_forms

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "pdf_forms_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_form_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(list(extract_forms_batch(iter([batch]))), ignore_index=True)
    return out.sort_values(
        ["url", "field_index"], kind="mergesort"
    ).reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} form-field rows -> {OUT}")

"""Freeze the microdata golden: run the microdata extractor kernel (no
Spark) over the deterministic microdata corpus and write the expected
rows to ``pdf_ocr_spark/fixtures/microdata_golden.parquet``.

The registry query ``html_microdata`` recomputes the same rows through
the distributed pipeline (``extract_microdata_rows``); its DuckDB
oracle reads this parquet.

Rerun (and commit the result) only when microdata semantics
intentionally change:  python tools/freeze_microdata_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_microdata_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_microdata_batch  # noqa: E402

N_DOCS = 48  # must match q_html_microdata

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "microdata_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_microdata_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(
        list(extract_microdata_batch(iter([batch]))), ignore_index=True
    )
    return out.sort_values(
        ["url", "item_index", "prop"], kind="mergesort"
    ).reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} microdata rows -> {OUT}")
    print(df["source"].value_counts(dropna=False).to_string())

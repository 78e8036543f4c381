"""Freeze the JSON-LD golden: run the structured-data extractor kernel
(no Spark) over the deterministic JSON-LD corpus and write the expected
rows to ``pdf_ocr_spark/fixtures/jsonld_golden.parquet``.

The registry query ``html_jsonld`` recomputes the same rows through the
distributed pipeline (``extract_structured_data``); its DuckDB oracle
reads this parquet.

Rerun (and commit the result) only when JSON-LD semantics intentionally
change:  python tools/freeze_jsonld_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_jsonld_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_jsonld_batch  # noqa: E402

N_DOCS = 56  # must match q_html_jsonld

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "jsonld_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_jsonld_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(
        list(extract_jsonld_batch(iter([batch]))), ignore_index=True
    )
    return out.sort_values(
        ["url", "block_index", "node_index"], kind="mergesort"
    ).reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} json-ld rows -> {OUT}")
    print(df["ld_type"].value_counts(dropna=False).to_string())

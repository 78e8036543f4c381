"""Freeze the composite-blocks golden: run the v4 composite renderer
kernel (no Spark) over the deterministic composite corpus and write the
expected rows to ``pdf_ocr_spark/fixtures/composites_golden.parquet``.

The registry query ``blocks_composite`` recomputes the same rows through
the distributed pipeline (``extract_composites``); its DuckDB oracle
reads this parquet — the correctness gate value-hashes pipeline-computed
composite strings against the frozen kernel output.

Rerun (and commit the result) only when composite semantics intentionally
change:  python tools/freeze_composites_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_composite_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_composites_batch  # noqa: E402

N_DOCS = 45  # must match q_blocks_composite

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "composites_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_composite_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(list(extract_composites_batch(iter([batch]))), ignore_index=True)
    return out.sort_values(
        ["url", "page_num", "block_index"], kind="mergesort"
    ).reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} composite rows -> {OUT}")
    print(df["kind"].value_counts().to_dict())

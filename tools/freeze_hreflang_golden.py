"""Freeze the hreflang golden: run the hreflang extractor kernel (no
Spark) over the deterministic hreflang corpus and write the expected
rows to ``pdf_ocr_spark/fixtures/hreflang_golden.parquet``.

The registry query ``hreflang_alternates`` recomputes the same rows
through the distributed pipeline (``extract_hreflang_links``); its
DuckDB oracle reads this parquet, and the ``hreflang_clusters`` oracle
builds its reciprocity SQL on top of it.

Rerun (and commit the result) only when hreflang semantics
intentionally change:  python tools/freeze_hreflang_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_hreflang_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import extract_hreflang_batch  # noqa: E402

N_CLUSTERS = 18  # must match q_hreflang_alternates / q_hreflang_clusters

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "hreflang_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_hreflang_rows(N_CLUSTERS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    out = pd.concat(
        list(extract_hreflang_batch(iter([batch]))), ignore_index=True
    )
    return out.sort_values(["url", "ord"], kind="mergesort").reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} hreflang rows -> {OUT}")

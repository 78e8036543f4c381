"""Freeze the pdf doc-metadata goldens: run the /Info and outline
kernels (no Spark) over the deterministic docmeta corpus and write the
expected rows to ``pdf_ocr_spark/fixtures/pdf_doc_info_golden.parquet``
and ``pdf_outline_golden.parquet``.

The registry queries ``pdf_doc_info`` / ``pdf_outline`` recompute the
same rows through the distributed pipeline; their DuckDB oracles read
these parquets.

Rerun (and commit) only on intentional semantic change:
  python tools/freeze_docmeta_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_docmeta_rows  # noqa: E402
from pdf_ocr_spark.pipeline.extract_job import (  # noqa: E402
    extract_doc_info_batch,
    extract_outline_batch,
)

N_DOCS = 36  # must match q_pdf_doc_info / q_pdf_outline

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures",
)


def main() -> None:
    rows = gen_docmeta_rows(N_DOCS)
    batch = pd.DataFrame(
        {"url": [r["url"] for r in rows], "html": [bytes(r["html"]) for r in rows]}
    )
    info = pd.concat(
        list(extract_doc_info_batch(iter([batch]))), ignore_index=True
    ).sort_values("url", kind="mergesort").reset_index(drop=True)
    out1 = os.path.join(FIX, "pdf_doc_info_golden.parquet")
    info.to_parquet(out1, index=False)
    print(f"wrote {len(info)} doc-info rows -> {out1}")

    ol = pd.concat(
        list(extract_outline_batch(iter([batch]))), ignore_index=True
    ).sort_values(["url", "order"], kind="mergesort").reset_index(drop=True)
    out2 = os.path.join(FIX, "pdf_outline_golden.parquet")
    ol.to_parquet(out2, index=False)
    print(f"wrote {len(ol)} outline rows -> {out2}")


if __name__ == "__main__":
    main()

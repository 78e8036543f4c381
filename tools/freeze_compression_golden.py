"""Freeze the compression-ratio golden: run the zlib kernel (no Spark)
over the deterministic metadata-corpus page bytes and write the expected
rows to ``pdf_ocr_spark/fixtures/compression_golden.parquet``.

The registry query ``text_compression`` recomputes the same rows through
the Arrow-batched operator (``compression_signals``); its DuckDB oracle
reads this parquet (DuckDB has no compression function — this is the
frozen-kernel-golden pattern, same as NFC's utf8proc cross-check is the
exception that proves it).

Rerun (and commit the result) only when the ratio definition changes:
python tools/freeze_compression_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_html_meta_rows  # noqa: E402
from pdf_ocr_spark.kernels.textstats import compression_ratio  # noqa: E402

N_DOCS = 48  # must match q_text_compression

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "compression_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = gen_html_meta_rows(N_DOCS)
    return pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "n_bytes": [len(r["html"]) for r in rows],
            "compression_ratio": [
                compression_ratio(bytes(r["html"])) for r in rows
            ],
        }
    ).sort_values("url", kind="mergesort").reset_index(drop=True)


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} compression rows -> {OUT}")
    print(df["compression_ratio"].describe().to_string())

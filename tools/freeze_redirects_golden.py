"""Freeze the redirects golden: run the redirect-record kernel (no
Spark) over the deterministic redirect archive and write the expected
rows to ``pdf_ocr_spark/fixtures/redirects_golden.parquet``.

The registry query ``warc_redirects`` recomputes the same rows through
the distributed route (``warc_redirects``); its DuckDB oracle reads
this parquet.

Rerun (and commit the result) only when redirect semantics intentionally
change:  python tools/freeze_redirects_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_redirect_archive  # noqa: E402
from pdf_ocr_spark.sources.warc import (  # noqa: E402
    REDIRECT_COLUMNS,
    redirect_records,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "redirects_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = redirect_records(gen_redirect_archive())
    out = pd.DataFrame(rows, columns=REDIRECT_COLUMNS)
    out["status"] = out["status"].astype("Int32")
    return out


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} redirect rows -> {OUT}")
    print(df.to_string())

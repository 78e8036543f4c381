"""Freeze the CDX golden: replay pages → WARC archive → CDX index with
the kernels alone (no Spark) over the deterministic CDX corpus and
write the expected rows to ``pdf_ocr_spark/fixtures/cdx_golden.parquet``.

The registry query ``warc_cdx`` recomputes the same rows through the
distributed pipeline (pages_to_warc → warc_cdx, one sorted partition so
the archive byte layout is pinned); its DuckDB oracle reads this
parquet.

Rerun (and commit the result) only when WARC/CDX semantics intentionally
change:  python tools/freeze_cdx_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_cdx_rows  # noqa: E402
from pdf_ocr_spark.sources.warc import (  # noqa: E402
    CDX_COLUMNS,
    cdx_records,
    pages_to_warc_batch,
)

FILENAME = "part-00000.warc"

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "cdx_golden.parquet",
)


def golden_frame() -> pd.DataFrame:
    rows = sorted(gen_cdx_rows(), key=lambda r: r["url"])
    batch = pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
        }
    )
    (archive,) = list(pages_to_warc_batch(iter([batch])))
    assert int(archive["n_records"][0]) == len(rows)
    cdx = cdx_records(bytes(archive["warc"][0]), FILENAME)
    out = pd.DataFrame(cdx, columns=CDX_COLUMNS)
    out["status"] = out["status"].astype("Int32")
    return out


if __name__ == "__main__":
    df = golden_frame()
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} cdx rows -> {OUT}")
    print(df.head(4).to_string())

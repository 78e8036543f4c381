"""Freeze the extraction-quality fixture: self-contained boilerplate
HTML pages (fixtures/genpages.make_html_page with its OWN rng stream —
no coupling to the gen_rows kind cycle) plus the article ground truth
and the in-process kernel extraction.

The `extract_quality` registry query re-runs the DISTRIBUTED extractor
on the frozen html bytes and scores token precision/recall/F1 against
`true_text`; the DuckDB oracle replays the metric arithmetic over the
frozen `extracted_text` column — so the gate pins BOTH the kernel's
determinism (live extraction must reproduce the frozen text through the
metric) and the metric math (verified cross-engine).

Rerun (and commit) only when extraction semantics intentionally change:
    python tools/freeze_extract_quality_golden.py
"""

from __future__ import annotations

import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import make_html_page  # noqa: E402
from pdf_ocr_spark.kernels.html_extract import extract_html  # noqa: E402

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures",
)
N_PAGES = 60


def main() -> None:
    rows = []
    for i in range(N_PAGES):
        rng = random.Random(777000 + i)
        lang = ("en", "ja", "zh")[i % 3]
        payload, true_text = make_html_page(rng, lang)
        extracted, status, _ = extract_html(payload)
        assert status == "ok", (i, status)
        rows.append(
            (f"https://example.test/quality/{i:06d}", payload, true_text, extracted)
        )
    df = pd.DataFrame(
        rows, columns=["url", "html", "true_text", "extracted_text"]
    )
    df.to_parquet(
        os.path.join(FIXTURES, "extract_quality_golden.parquet"), index=False
    )
    print(f"froze {len(df)} pages; sample extracted: "
          f"{rows[0][3][:80]!r}")


if __name__ == "__main__":
    main()

"""Freeze the feed-items golden: run the RSS/Atom parser kernel (no
Spark) over the deterministic feeds corpus; the ``feed_items`` registry
query recomputes the rows through the distributed route and its DuckDB
oracle reads this parquet.

Rerun (and commit) only on intentional semantic change:
  python tools/freeze_feeds_golden.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.fixtures.genpages import gen_feed_rows  # noqa: E402
from pdf_ocr_spark.kernels.robots import parse_feed  # noqa: E402

N_DOCS = 24  # must match q_feed_items

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "feed_items_golden.parquet",
)

if __name__ == "__main__":
    rows = []
    for r in gen_feed_rows(N_DOCS):
        for link, title, date in parse_feed(bytes(r["body"])):
            rows.append((r["url"], link, title, date))
    df = pd.DataFrame(rows, columns=["feed", "link", "title", "date"])
    df = df.sort_values(["feed", "link"], kind="mergesort").reset_index(drop=True)
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} feed-item rows -> {OUT}")

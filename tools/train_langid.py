"""Freeze the hashed-trigram language-ID weight table
(operators/langid.train_weights) to
pdf_ocr_spark/fixtures/langid_weights.parquet.

Deterministic (no RNG): rerun only when the seed corpora or the hash
change.  The committed parquet is read by BOTH the Spark operator and
the DuckDB oracle, so the text_lang_id2 gate compares the distributed
scorer against an independent SQL replay over identical weights.

Rerun:  python tools/train_langid.py
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_ocr_spark.operators.langid import train_weights  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_ocr_spark", "fixtures", "langid_weights.parquet",
)


def main() -> None:
    rows = train_weights()
    df = pd.DataFrame(rows, columns=["bucket", "lang", "weight"])
    df["bucket"] = df["bucket"].astype("int32")
    df["weight"] = df["weight"].astype("int64")
    df.to_parquet(OUT, index=False)
    print(f"{len(df)} weights ({df.lang.nunique()} langs) -> {OUT}")


if __name__ == "__main__":
    main()

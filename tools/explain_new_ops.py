"""Plan audit for the round-4 operators: prints formatted plans so the
broadcast / zero-shuffle / pushdown claims in the docstrings can be
checked against what Catalyst actually builds.

    python tools/explain_new_ops.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("explain-new-ops")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdf_ocr_spark.queries import REGISTRY

    for name in [
        "dedup_span_remove",
        "wordpiece_pair_scores",
        "quality_nb_score",
        "sim_pq_codes",
        "sim_pq_topk",
        "text_c4_line_apply",
        # round-4 session-4 additions
        "link_trustrank",
        "link_harmonic",
        "link_harmonic_hyperball",
        "search_phrase",
        "dedup_containment",
        "crawl_change_rate",
        "sketch_hll_distinct",
        "sketch_cms_freq",
        "sink_warc_revisit",
    ]:
        fn, _ = REGISTRY[name]
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        fn(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` (default 32)
and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is total wall-clock over the benchmark suite; the
north-rule throughput number (extracted docs/sec over the synthetic
Common-Crawl-style pages corpus) is reported alongside as
``docs_per_sec``.  Each query is forced end-to-end with a noop sink so
nothing is collected to the driver.
"""

from __future__ import annotations

import gc as _gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# representative, scale-sensitive subset of the registry: scan-heavy aggs,
# shuffle joins, window argmax, dedup/similarity fan-outs, and the
# extraction pipeline itself
BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3ish",
    "tpch_q6ish",
    "events_session_windows",
    "events_hourly",
    "a1_ordered_concat",
    "a2_doc_headers",
    "w1_argmax",
    "j1_broadcast_join",
    "j3_anti_join",
    "dedup_exact",
    "dedup_incremental",
    "snapshot_delta",
    "dedup_minhash_lsh",
    "dedup_verified_lsh",
    "dedup_simhash",
    "dedup_embedding_bucketed",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_ivf_kmeans",
    "text_lang_id",
    "text_lang_id2",
    "jpeg_scan_ocr",
    "ccitt_scan_ocr",
    "jbig2_scan_ocr",
    "jpx_scan_ocr",
    "text_quality",
    "text_gopher",
    "domain_reputation",
    "blocklist_filter",
    "text_repetition",
    "text_fingerprint",
    "a5_span_fold",
    "p9_content_sniff",
    "stream_windowed_counts",
    "tpch_rollup",
    "extract_corpus",
    "blocks_table",
    "html_tables",
    "dedup_dup_spans",
    "text_mojibake",
    "sample_stratified",
    "robots_frontier",
    "text_lm_score",
    "text_lm_bigram",
    "search_bm25",
    "anchor_text_profile",
    "dedup_apply",
    "fetch_schedule",
    "training_mix",
    "filter_funnel",
    "text_decontaminate_fuzzy",
    "dsir_resample",
    "dedup_semantic",
    "bitext_mining_lsh",  # the bucketed scale path is the headline;
    # the all-pairs exactness baseline stays oracle-gated in the registry
    "dedup_bloom_prefilter",
    "tfidf_keywords",
    "link_hits",
    "crawl_traps",
    "ingest_validate",
    "sink_warc_roundtrip",
    "sink_wet_export",
    "warc_cdx",
    "html_jsonld",
    "link_host_graph",
    "export_shards",
    "warc_redirects",
    "redirect_resolve",
    "wet_cdx",
    "text_compression",
    "domain_kl_drift",
    "dedup_recall",
    "sink_wat_export",
    "bpe_pair_counts",
    "unigram_seed_counts",
    "wordpiece_pair_scores",
    "quality_nb_score",
    "sim_pq_topk",
    "filter_funnel_v2",
    "crawl_budget",
    "page_freshness",
    "crawl_cycle",
    "url_spam_features",
    "link_trustrank",
    "link_harmonic_hyperball",
    "dedup_containment",
    "search_phrase",
    "sketch_hll_distinct",
    "sink_warc_revisit",
    "sample_weighted",
    "sketch_quantile_hist",
    "link_communities",
    "hreflang_clusters",
    "link_degree_dist",
    "dedup_source_rates",
    "link_pagerank_incremental",
    "warc_header_gate",
    "sim_matryoshka_recall",
    "tpch_q5ish",
    "tpch_q14ish",
]

N_BENCH_DOCS = 2400  # synthetic pages corpus size for the throughput number


def build_session(cpus: int):
    from pdf_ocr_spark.pipeline.session import get_spark

    return get_spark("pdf-ocr-spark-bench", cores=cpus, shuffle_partitions=cpus)


def force(df) -> int:
    """Materialize a DataFrame fully without driver-side collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_extraction(spark, n_docs: int) -> tuple[float, int]:
    """North-rule throughput: docs/sec of the full extraction pipeline
    over the deterministic synthetic pages corpus, read from parquet the
    way a real run would (createDataFrame would bottleneck on the
    driver-side upload and understate the pipeline)."""
    import tempfile

    from pdf_ocr_spark.fixtures.genpages import write_corpus
    from pdf_ocr_spark.pipeline.extract_job import extract_documents

    with tempfile.TemporaryDirectory() as tmp:
        corpus = os.path.join(tmp, "pages")
        write_corpus(corpus, n_docs, n_files=32)
        pages = spark.read.parquet(corpus)
        force(extract_documents(pages))  # warmup: python workers + codegen
        best = None
        for _ in range(2):  # best-of-2, like the per-query timings
            t0 = time.monotonic()
            force(extract_documents(pages))
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        return best, n_docs


def cpu_calibration() -> float:
    """Fixed single-thread workload (hash 48 MB) — a host-weather
    denominator for cross-round comparisons on this steal-prone VM:
    divide suite walls by their calibrations before calling a per-query
    change a regression (see memory: timings fluctuate up to 4x with
    hypervisor weather while the code is identical)."""
    import hashlib

    blob = (b"\x5a" * (1 << 20)) * 8
    t0 = time.monotonic()
    for _ in range(24):
        hashlib.md5(blob).digest()
    acc = 0
    for i in range(6_000_000):  # interpreter-bound: tracks steal directly
        acc += i * i
    return round(time.monotonic() - t0, 3)


def warmup_session(spark) -> None:
    """Pay one-time JVM/codegen/python-worker costs before any timing:
    a tiny JVM-side aggregation plus a tiny run of the fused extractor
    (spins up one python worker per core with all kernel imports)."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.fixtures.genpages import gen_rows
    from pdf_ocr_spark.pipeline.extract_job import extract_documents

    spark.range(100000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    rows = gen_rows(256)
    pages = spark.createDataFrame(
        [(r["url"], bytearray(r["html"])) for r in rows],
        schema="url string, html binary",
    )
    force(extract_documents(pages))





def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    except ValueError:
        sf = os.path.basename(sf_dir.rstrip("/"))
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"bench: data dir not found: {sf_dir}")

    cal = cpu_calibration()
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warmup_session(spark)

    from pdf_ocr_spark.queries import queries as registry

    qmap = registry()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qmap:
            continue
        # per-query isolation (same block as tools/verify_oracle.py):
        # ~20 registry queries persist() fixtures/intermediates, and 89
        # queries in ONE session also accumulate un-GC'd broadcasts /
        # localCheckpoint blocks whose cleanup (ContextCleaner) only runs
        # on a JVM GC — without this, late-suite queries measure session
        # drag (observed r4: 1.2x early-suite -> 2.6x mid-suite on
        # identical plans), not the engine.  Python gc first so py4j refs
        # release, then an explicit JVM GC; timing starts AFTER the GC.
        spark.catalog.clearCache()
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        # best-of-2: a long session occasionally hits a one-off GC/JIT
        # stall on a single query (observed 20x spikes); the repeat gives
        # the steady-state number
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            force(qmap[name](spark, sf_dir))
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # the throughput number gets the same clean-room start as every query
    spark.catalog.clearCache()
    _gc.collect()
    spark.sparkContext._jvm.System.gc()
    ext_sec, n_docs = bench_extraction(spark, N_BENCH_DOCS)
    timings["extraction_pipeline"] = round(ext_sec, 3)

    total = round(sum(timings.values()), 3)
    # weather normalization (see BENCH/BASELINE.md "Weather protocol"):
    # nominal calibration = r2 idle-box measurement; dividing by the
    # run's calibration corrects cross-round comparisons for CPU steal.
    nominal_cal = 0.961
    payload = {
        "metric": "bench suite wall clock (headline queries + extraction pipeline)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(n_docs / ext_sec, 2),
        "extraction_docs": n_docs,
        "cpus": cpus,
        "calibration_sec": cal,
        "calibration_nominal_sec": nominal_cal,
        "value_weather_normalized": round(total * (nominal_cal / cal), 3) if cal else None,
        "docs_per_sec_weather_normalized": round((n_docs / ext_sec) * (cal / nominal_cal), 2) if cal else None,
    }
    # The driver captures the LAST line through a bounded tail buffer;
    # the r3 artifact came back "parsed": null because the full 78-query
    # map pushed the line past it.  Print a compact line (slowest-20
    # queries at 2 decimals + an elision count) and keep the complete
    # per-query map in BENCH/history.jsonl and BENCH/queries_latest.json.
    hist_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        os.makedirs(hist_dir, exist_ok=True)
        with open(os.path.join(hist_dir, "history.jsonl"), "a") as fh:
            fh.write(json.dumps(payload) + "\n")
        with open(os.path.join(hist_dir, "queries_latest.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
    except OSError:
        pass  # history is best-effort; never fail the bench over it
    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    compact = dict(payload)
    compact["queries"] = {k: round(v, 2) for k, v in sorted(top.items())}
    compact["queries_total"] = len(timings)
    compact["queries_elided"] = len(timings) - len(top)
    compact["queries_full"] = "BENCH/queries_latest.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()

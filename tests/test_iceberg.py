"""Optional real-Iceberg runtime path (snapshot_log.run_extraction_iceberg).

The sandbox ships no iceberg-spark-runtime jar, so coverage splits:
  * seam tests pin the writer-call contract (create-on-first-run,
    append-after) with a recording stub — no jar needed;
  * the loud-unavailable error is asserted against the real session;
  * an end-to-end append+resume test is gated on the jar being present
    (skips here, runs on any cluster launched with the Iceberg runtime).
"""

from __future__ import annotations

import pytest

from pdf_ocr_spark.pipeline.snapshot_log import (
    _append_to_table,
    iceberg_available,
    run_extraction_iceberg,
)


class _RecordingWriter:
    def __init__(self, log, ident):
        self.log = log
        self.ident = ident

    def create(self):
        self.log.append(("create", self.ident))

    def append(self):
        self.log.append(("append", self.ident))


class _FakeDocs:
    """Minimal stand-in for a DataFrame at the write seam."""

    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):  # noqa: N802 — Spark API casing
        return _RecordingWriter(self.log, ident)


def test_append_seam_calls_create_on_first_run():
    log = []
    _append_to_table(_FakeDocs(log), "glacier.docs", create=True)
    assert log == [("create", "glacier.docs")]


def test_append_seam_calls_append_on_existing_table():
    log = []
    _append_to_table(_FakeDocs(log), "glacier.docs", create=False)
    assert log == [("append", "glacier.docs")]


def test_iceberg_not_available_in_sandbox(spark):
    """This environment has no iceberg-spark-runtime jar; the probe must
    say so (and not raise)."""
    assert iceberg_available(spark) is False


def test_run_extraction_iceberg_raises_without_runtime(spark, corpus_parquet):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        run_extraction_iceberg(spark, corpus_parquet, "glacier.docs")


def test_iceberg_e2e_append_and_resume(spark, corpus_parquet, tmp_path):
    """Full path against a REAL Iceberg catalog — runs only when the jar
    is present (e.g. spark-submit --packages iceberg-spark-runtime) and
    a `local` hadoop catalog is configured; skips in the sandbox."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    spark.conf.set(
        "spark.sql.catalog.graft_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.graft_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", str(tmp_path / "wh"))
    ident = "graft_test.db.docs"
    n1 = run_extraction_iceberg(spark, corpus_parquet, ident)
    assert n1 > 0
    assert spark.table(ident).count() == n1
    # second run resumes: nothing new to append
    n2 = run_extraction_iceberg(spark, corpus_parquet, ident)
    assert n2 == 0
    assert spark.table(ident).count() == n1
    # lineage table committed alongside
    assert spark.table(f"{ident}_lineage").count() > 0

"""Shared fixtures: one local SparkSession per test session, plus the
deterministic synthetic corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PDF = "/root/reference/japanese_test.pdf"
TESTDATA_SF001 = "/root/testdata/sf0.001"
TESTDATA_SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pdf_ocr_spark.pipeline.session import get_spark

    s = get_spark(app_name="pdf-ocr-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from pdf_ocr_spark.fixtures.genpages import gen_rows

    return gen_rows(100)


@pytest.fixture(scope="session")
def corpus_parquet(tmp_path_factory):
    from pdf_ocr_spark.fixtures.genpages import write_corpus

    path = str(tmp_path_factory.mktemp("corpus") / "pages.parquet")
    write_corpus(path, 100)
    return path


def local_extract(data: bytes):
    """Reference-path extraction done entirely outside Spark — the
    equivalence oracle for the pipeline tests."""
    from pdf_ocr_spark.kernels.html_extract import extract_html
    from pdf_ocr_spark.kernels.ocr_stub import get_engine, ocr_page_text
    from pdf_ocr_spark.kernels.pdf.extract import assemble_doc_text, extract_pdf

    if data[:5] == b"%PDF-" or b"%PDF-" in data[:1024]:
        d = extract_pdf(data)
        if d.status != "ok":
            return None, "failed", d.failure_reason
        texts = []
        for p in d.pages:
            if p.needs_ocr:
                texts.append(
                    ocr_page_text(get_engine().recognize_batch([p.ocr_payload])[0])
                )
            else:
                texts.append(p.text)
        return assemble_doc_text(texts), "ok", None
    t, s, r = extract_html(data)
    return (t if s == "ok" else None), s, r

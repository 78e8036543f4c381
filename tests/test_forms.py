"""AcroForm field extraction: field-tree semantics, text-string
decoding, and the distributed route."""

from __future__ import annotations

import random

from pdf_ocr_spark.fixtures.genpages import gen_form_rows, make_form_pdf
from pdf_ocr_spark.kernels.pdf.forms import decode_text_string, extract_form_fields


def test_form_field_tree_semantics():
    fields = {f.name: f for f in extract_form_fields(make_form_pdf(random.Random(7)))}
    # UTF-16BE value decoded
    assert fields["city"].value in ("東京都", "大阪市", "Quebec", "Zürich")
    # name-valued /V (checkbox)
    assert fields["agree"] == ("agree", "Btn", "Yes")
    # hierarchy composes names; /FT inherits from the parent
    assert fields["address.line1"].field_type == "Tx"
    assert fields["address.line2"].value == "Chiyoda (ward)"
    # the parent node itself is NOT terminal
    assert "address" not in fields
    # widget-only kids collapse into the terminal field
    assert fields["note"].value == "hello"


def test_decode_text_string_variants():
    assert decode_text_string(b"plain") == "plain"
    assert decode_text_string("﻿東".encode("utf-16-be")) == "東"
    assert decode_text_string(b"a\x85b") == "a–b"  # PDFDoc en-dash
    assert decode_text_string(None) == ""


def test_formless_inputs_emit_nothing():
    from pdf_ocr_spark.fixtures.genpages import make_html_page, make_simple_pdf

    assert extract_form_fields(make_simple_pdf([["no form"]])) == []
    html, _ = make_html_page(random.Random(1), "en")
    assert extract_form_fields(html) == []
    assert extract_form_fields(b"%PDF-garbage") == []


def test_forms_route_matches_kernel(spark):
    from pdf_ocr_spark.pipeline.extract_job import extract_forms

    rows = gen_form_rows(12)
    pages = spark.createDataFrame(
        [(r["url"], bytearray(r["html"])) for r in rows],
        "url string, html binary",
    )
    via_spark = {
        (r.url, r.field_index, r.name, r.field_type, r.value)
        for r in extract_forms(pages, num_partitions=2).collect()
    }
    expected = set()
    for r in rows:
        for i, f in enumerate(extract_form_fields(bytes(r["html"]))):
            expected.add((r["url"], i, f.name, f.field_type, f.value))
    assert via_spark == expected and expected


def test_doc_info_and_outline_kernel():
    from pdf_ocr_spark.fixtures.genpages import make_outline_pdf, make_simple_pdf
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_doc_info, extract_outline

    pdf = make_outline_pdf(random.Random(3))
    info = extract_doc_info(pdf)
    assert info.n_pages == 3 and info.producer == "genpages"
    assert info.created == "D:20250102030405Z"
    items = extract_outline(pdf)
    assert [(i.level, i.title, i.page_num) for i in items] == [
        (1, "Chapter 1", 1),       # /Dest array
        (2, "Section 1.1", 2),     # nested via /First; /A GoTo action
        (1, "第二章", 3),           # UTF-16BE title
    ]
    assert [i.order for i in items] == [0, 1, 2]
    plain = make_simple_pdf([["x"]])
    assert extract_outline(plain) == []
    assert extract_doc_info(plain).title is None
    assert extract_doc_info(plain).n_pages == 1


def test_docinfo_never_raises_on_garbage():
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_doc_info, extract_outline

    for junk in (b"", b"%PDF-", b"%PDF-1.7 garbage", b"\x00" * 128):
        extract_doc_info(junk)
        extract_outline(junk)


def test_annotations_kernel():
    from pdf_ocr_spark.fixtures.genpages import make_annot_pdf, make_simple_pdf
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_annotations

    anns = extract_annotations(make_annot_pdf(random.Random(2)))
    by_type = {a.subtype: a for a in anns}
    assert by_type["Text"].author == "reviewer-a"
    assert by_type["Highlight"].contents == "要確認"       # UTF-16BE
    assert by_type["FreeText"].page_num == 2
    # geometry-only Square and Link annots skipped
    assert set(by_type) == {"Text", "Highlight", "FreeText"}
    assert [a.order for a in anns] == [0, 1, 2]
    assert extract_annotations(make_simple_pdf([["x"]])) == []
    for junk in (b"", b"%PDF-junk"):
        extract_annotations(junk)  # never raises


def test_outline_cyclic_page_tree_terminates():
    """A /Pages node whose /Kids reference itself must not hang the
    page-ref index walk (cycle guard, same as cos.pages())."""
    from pdf_ocr_spark.fixtures.genpages import _PdfWriter
    from pdf_ocr_spark.kernels.pdf.docinfo import extract_outline

    w = _PdfWriter()
    catalog = w.reserve()
    pages = w.reserve()
    item = w.reserve()
    outlines = w.add(b"<< /Type /Outlines /First %d 0 R >>" % item)
    w.fill(item, b"<< /Title (loop) /Parent %d 0 R >>" % outlines)
    # Kids contains the node itself, twice
    w.fill(pages, b"<< /Type /Pages /Kids [%d 0 R %d 0 R] /Count 0 >>"
           % (pages, pages))
    w.fill(catalog, b"<< /Type /Catalog /Pages %d 0 R /Outlines %d 0 R >>"
           % (pages, outlines))
    items = extract_outline(w.build(catalog))  # must return, not hang
    assert [i.title for i in items] == ["loop"]

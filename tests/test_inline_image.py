"""Inline images (BI…ID…EI): abbreviated-dict expansion, filter decode
to real P5 pixels, OCR routing, and the plain-pixels XObject path."""

from __future__ import annotations

import zlib

from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_inline
from pdf_ocr_spark.kernels.ocr_stub import STUB_MARKER
from pdf_ocr_spark.kernels.pdf.extract import extract_pdf


def test_inline_scan_reaches_ocr_with_decoded_pixels():
    pdf = make_scan_pdf_inline(["first inline page", "second inline page"])
    d = extract_pdf(pdf)
    assert d.status == "ok" and len(d.pages) == 2
    for p, expected in zip(d.pages, ["first inline page", "second inline page"]):
        assert p.needs_ocr and p.ocr_payload
        # the payload is REAL decoded P5 (abbreviations expanded, Flate
        # inflated), not the raw deflate bytes
        assert p.ocr_payload.startswith(b"P5\n64 ")
        assert STUB_MARKER + expected.encode() in p.ocr_payload
    # and the stub OCR (the pipeline's next stage) reads the marker out
    # of the decoded pixels
    from pdf_ocr_spark.kernels.ocr_stub import StubOcrEngine

    outs = StubOcrEngine().recognize_batch([p.ocr_payload for p in d.pages])
    assert [o[0][0] for o in outs] == ["first inline page", "second inline page"]


def test_inline_image_mask_expands_bits():
    from pdf_ocr_spark.kernels.pdf.content import inline_image_payload
    from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

    doc = PDFDocument(make_scan_pdf_inline(["x"]))
    # 8x2 1-bit mask: first byte 0b10101010, second 0b11110000
    payload = bytes([0b10101010, 0b11110000])
    out = inline_image_payload(doc, b"/W 8 /H 2 /IM true", payload)
    assert out.startswith(b"P5\n8 2\n255\n")
    body = out.split(b"\n", 3)[3]
    assert body[:8] == bytes([255, 0] * 4)
    assert body[8:] == bytes([255] * 4 + [0] * 4)


def test_inline_bad_dict_falls_back_to_raw():
    from pdf_ocr_spark.kernels.pdf.content import inline_image_payload
    from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

    doc = PDFDocument(make_scan_pdf_inline(["x"]))
    raw = b"\x01\x02\x03garbage"
    assert inline_image_payload(doc, b"/W nonsense <<", raw) == raw
    # size-mismatched geometry also stays raw (the stub-fixture guard)
    assert inline_image_payload(doc, b"/W 999 /H 999 /CS /G /BPC 8", raw) == raw


def test_xobject_plain_flate_gray_emits_p5():
    from pdf_ocr_spark.kernels.pdf.content import image_ocr_payload
    from pdf_ocr_spark.kernels.pdf.cos import PDFDocument, Stream

    doc = PDFDocument(make_scan_pdf_inline(["x"]))
    pixels = bytes(range(16))
    xo = Stream(
        {"Width": 4, "Height": 4, "BitsPerComponent": 8,
         "ColorSpace": "DeviceGray", "Filter": "FlateDecode"},
        zlib.compress(pixels),
    )
    assert image_ocr_payload(doc, xo) == b"P5\n4 4\n255\n" + pixels
    # RGB folds to integer BT.601 luma
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    xo2 = Stream(
        {"Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": "DeviceRGB", "Filter": "FlateDecode"},
        zlib.compress(rgb),
    )
    out = image_ocr_payload(doc, xo2)
    assert out == b"P5\n2 2\n255\n" + bytes([
        255 * 299 // 1000, 255 * 587 // 1000, 255 * 114 // 1000,
        (10 * 299 + 20 * 587 + 30 * 114) // 1000,
    ])

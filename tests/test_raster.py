"""S10 rasterizer: geometry contract, determinism, caps, and the
vector-only → rasterize → OCR routing in extract_pdf."""

import hashlib

from pdf_ocr_spark.fixtures.genpages import (
    gen_raster_rows,
    make_ruled_table_pdf,
    make_vector_pdf,
)
from pdf_ocr_spark.kernels.pdf.content import Glyph, interpret_page
from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
from pdf_ocr_spark.kernels.pdf.extract import extract_pdf
from pdf_ocr_spark.kernels.pdf.raster import (
    DEFAULT_DPI,
    ink_pixels,
    parse_pgm,
    rasterize_page,
)


def _px(pgm, x, y):
    w, h, body = parse_pgm(pgm)
    return body[y * w + x]


class TestGeometry:
    def test_empty_page_is_white(self):
        pgm = rasterize_page([], [], [], 72.0, 72.0, dpi=72)
        w, h, body = parse_pgm(pgm)
        assert (w, h) == (72, 72)
        assert ink_pixels(pgm) == 0
        assert set(body) == {255}

    def test_zoom_matches_reference_contract(self):
        # pixel = point × dpi/72, the get_pixmap zoom (v2:202-204)
        pgm = rasterize_page([], [], [], 612.0, 792.0, dpi=144)
        w, h, _ = parse_pgm(pgm)
        assert (w, h) == (1224, 1584)

    def test_horizontal_rule_lands_on_flipped_row(self):
        # device y=10 (y-up) on a 72×72pt page at dpi 72 → pixel row 61
        pgm = rasterize_page([], [(10.0, 10.0, 60.0, 10.0)], [], 72.0, 72.0, dpi=72)
        assert _px(pgm, 30, 72 - 1 - 10) == 0
        assert _px(pgm, 30, 30) == 255  # elsewhere untouched
        assert ink_pixels(pgm) > 0

    def test_image_draw_fills_gray(self):
        pgm = rasterize_page([], [], [(10.0, 10.0, 30.0, 30.0)], 72.0, 72.0, dpi=72)
        assert _px(pgm, 20, 72 - 1 - 20) == 128

    def test_glyph_box_paints_black_over_image_fill(self):
        g = Glyph("A", 12.0, 12.0, 10.0, 10.0, "F1", 0)
        pgm = rasterize_page(
            [g], [], [(0.0, 0.0, 72.0, 72.0)], 72.0, 72.0, dpi=72
        )
        assert _px(pgm, 15, 72 - 1 - 15) == 0   # glyph ink wins
        assert _px(pgm, 60, 5) == 128           # image fill elsewhere

    def test_side_cap_shrinks_keeping_aspect(self):
        pgm = rasterize_page([], [], [], 10000.0, 5000.0, dpi=200)
        w, h, _ = parse_pgm(pgm)
        assert max(w, h) <= 2048
        assert abs(w / h - 2.0) < 0.01

    def test_degenerate_geometry_never_raises(self):
        pgm = rasterize_page(
            [],
            [(-1e9, -1e9, 1e9, 1e9), (5.0, 5.0, 5.0, 5.0)],
            [(-50.0, -50.0, -10.0, -10.0)],
            0.0,
            -3.0,
            dpi=200,
        )
        parse_pgm(pgm)

    def test_deterministic(self):
        doc = PDFDocument(make_ruled_table_pdf("cap", [["a", "1"]], "fn"))
        res = interpret_page(doc, doc.pages()[0])
        a = rasterize_page(res.glyphs, res.rules, res.image_draws,
                           res.width, res.height)
        b = rasterize_page(res.glyphs, res.rules, res.image_draws,
                           res.width, res.height)
        assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()
        assert DEFAULT_DPI == 200  # the reference v3/v4 default


class TestVectorOnlyRouting:
    def test_vector_page_routes_to_ocr_with_pgm_payload(self):
        doc = extract_pdf(make_vector_pdf())
        assert doc.status == "ok"
        [page] = doc.pages
        assert page.needs_ocr
        assert page.text == ""
        assert page.ocr_payload.startswith(b"P5\n")
        assert ink_pixels(page.ocr_payload) > 0

    def test_text_page_with_rules_stays_text(self):
        doc = extract_pdf(make_ruled_table_pdf("cap", [["a", "1"]], "fn"))
        [page] = doc.pages
        assert not page.needs_ocr
        assert "cap" in page.text

    def test_truly_blank_page_stays_empty_not_ocr(self):
        from pdf_ocr_spark.fixtures.genpages import _one_page_pdf

        doc = extract_pdf(_one_page_pdf(b""))
        [page] = doc.pages
        assert not page.needs_ocr
        assert page.text == ""


class TestRasterCorpus:
    def test_raster_rows_cover_vector_docs(self):
        rows = gen_raster_rows(n=20, n_vector=2)
        assert sum(1 for r in rows if r["kind"] == "vector") == 2
        # vector docs are stable across calls (frozen-golden prerequisite)
        again = gen_raster_rows(n=20, n_vector=2)
        assert [r["html"] for r in rows] == [r["html"] for r in again]

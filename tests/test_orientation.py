"""K4 content-based OSD: flow-direction votes, the rotation verdict,
and reading-order recovery for pages whose rotation is baked into text
matrices (no /Rotate attribute)."""

from pdf_ocr_spark.fixtures.genpages import (
    gen_orientation_rows,
    make_rotated_pdf,
    make_simple_pdf,
)
from pdf_ocr_spark.kernels.pdf.content import (
    dominant_rotation,
    interpret_page,
    normalize_page_rotation,
)
from pdf_ocr_spark.kernels.pdf.cos import PDFDocument
from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

LINES = ["alpha bravo charlie", "delta echo foxtrot", "golf hotel india"]


class TestVotes:
    def test_upright_page_votes_upright(self):
        doc = PDFDocument(make_rotated_pdf(LINES, 0))
        res = interpret_page(doc, doc.pages()[0])
        v = res.rot_votes
        assert v[0] > 0 and v[1] == v[2] == v[3] == 0
        assert dominant_rotation(v) == 0

    def test_each_angle_detected(self):
        for angle in (90, 180, 270):
            doc = PDFDocument(make_rotated_pdf(LINES, angle))
            res = interpret_page(doc, doc.pages()[0])
            assert dominant_rotation(res.rot_votes) == angle, angle

    def test_mixed_page_majority_required(self):
        # strict majority: ties and upright-heavy mixes stay upright
        assert dominant_rotation((10, 10, 0, 0)) == 0
        assert dominant_rotation((10, 11, 0, 0)) == 90
        assert dominant_rotation((0, 0, 0, 0)) == 0
        assert dominant_rotation((0, 5, 5, 5)) == 90  # rotated tie → smaller

    def test_rotate_attribute_pages_stay_upright(self):
        # a scanner page: content authored sideways + /Rotate 180 (the
        # realistic pairing).  /Rotate folds into the base CTM, so the
        # glyphs already flow upright — content OSD must NOT
        # double-rotate those pages
        content = b"BT /F1 12 Tf -1 0 0 -1 300 100 Tm (hello there) Tj ET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792]"
            b" /Rotate 180 >>",
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
        doc = PDFDocument(bytes(out))
        res = interpret_page(doc, doc.pages()[0])
        assert dominant_rotation(res.rot_votes) == 0
        assert extract_pdf(bytes(out)).pages[0].text == "hello there"


class TestNormalization:
    def test_text_parity_with_upright_twin(self):
        up = extract_pdf(make_rotated_pdf(LINES, 0))
        for angle in (90, 180, 270):
            rot = extract_pdf(make_rotated_pdf(LINES, angle))
            assert rot.pages[0].text == up.pages[0].text, angle

    def test_dims_swap_for_quarter_turns(self):
        doc = PDFDocument(make_rotated_pdf(LINES, 90))
        res = interpret_page(doc, doc.pages()[0])
        norm = normalize_page_rotation(res, 90)
        assert (norm.width, norm.height) == (res.height, res.width)
        half = normalize_page_rotation(res, 180)
        assert (half.width, half.height) == (res.width, res.height)

    def test_unknown_angle_is_identity(self):
        doc = PDFDocument(make_rotated_pdf(LINES, 0))
        res = interpret_page(doc, doc.pages()[0])
        assert normalize_page_rotation(res, 45) is res

    def test_upright_corpus_unaffected(self):
        # the standard mix must extract identically with OSD active
        # (no upright page crosses the strict-majority threshold)
        pdf = make_simple_pdf([["hello world", "second line"]], style=0)
        doc = extract_pdf(pdf)
        assert "hello world" in doc.pages[0].text


class TestOrientationCorpus:
    def test_rotated_rows_present_and_stable(self):
        rows = gen_orientation_rows(n=10)
        rot = [r for r in rows if r["kind"] == "rotated"]
        assert len(rot) == 4
        again = gen_orientation_rows(n=10)
        assert [r["html"] for r in rows] == [r["html"] for r in again]

"""Unit tests for the COS layer: lexer, filters, xref, page tree."""

import zlib

import pytest

from pdf_ocr_spark.kernels.pdf.cos import Lexer, Name, PDFDocument, PDFError, Ref, Stream


def parse(src: bytes):
    return Lexer(src).parse_object()


class TestLexer:
    def test_numbers(self):
        assert parse(b"42") == 42
        assert parse(b"-17") == -17
        assert parse(b"3.14") == pytest.approx(3.14)
        assert parse(b".5") == pytest.approx(0.5)
        assert parse(b"+2") == 2

    def test_ref_vs_numbers(self):
        assert parse(b"12 0 R") == Ref(12, 0)
        # two ints NOT followed by R stay plain (array context)
        assert parse(b"[1 2 3]") == [1, 2, 3]
        assert parse(b"[12 0 R 5]") == [Ref(12, 0), 5]

    def test_names(self):
        assert parse(b"/Type") == Name("Type")
        assert parse(b"/A#20B") == Name("A B")  # #xx escape
        assert parse(b"/") == Name("")

    def test_literal_strings(self):
        assert parse(rb"(hello)") == b"hello"
        assert parse(rb"(a\(b\)c)") == b"a(b)c"
        assert parse(b"(nested (parens) ok)") == b"nested (parens) ok"
        assert parse(rb"(tab\there)") == b"tab\there"
        assert parse(rb"(oct\101al)") == b"octAal"
        assert parse(b"(line\\\ncontinue)") == b"linecontinue"

    def test_hex_strings(self):
        assert parse(b"<48656C6C6F>") == b"Hello"
        assert parse(b"<48 65 6C>") == b"Hel"  # embedded whitespace
        assert parse(b"<486>") == b"H`"  # odd length pads with 0

    def test_dict_and_array(self):
        d = parse(b"<< /A 1 /B [2 3] /C << /D (x) >> >>")
        assert d == {"A": 1, "B": [2, 3], "C": {"D": b"x"}}

    def test_booleans_null(self):
        assert parse(b"true") is True
        assert parse(b"false") is False
        assert parse(b"null") is None

    def test_comments_skipped(self):
        assert parse(b"% comment\n42") == 42


def _minimal_pdf(content: bytes = b"BT ET") -> bytes:
    """Hand-rolled 5-object classic-xref PDF."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
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
        len(objs) + 1,
        xref,
    )
    return bytes(out)


class TestDocument:
    def test_minimal(self):
        doc = PDFDocument(_minimal_pdf())
        pages = doc.pages()
        assert len(pages) == 1
        assert doc.page_content(pages[0]) == b"BT ET"

    def test_inherited_mediabox(self):
        doc = PDFDocument(_minimal_pdf())
        page = doc.pages()[0]
        assert doc.resolve(page["MediaBox"]) == [0, 0, 612, 792]

    def test_broken_xref_recovers_by_scan(self):
        data = _minimal_pdf()
        # corrupt the startxref offset → brute-force object scan kicks in
        broken = data.replace(b"startxref\n", b"startxref\n9")
        doc = PDFDocument(broken)
        assert len(doc.pages()) == 1

    def test_not_a_pdf(self):
        with pytest.raises(PDFError):
            PDFDocument(b"GIF89a not a pdf at all")

    def test_truncated_fails_cleanly(self):
        data = _minimal_pdf()
        with pytest.raises(PDFError):
            PDFDocument(data[:40])

    def test_indirect_length(self):
        # /Length as an indirect reference
        content = b"BT (x) Tj ET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 10 10] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length 5 0 R >>\nstream\n%s\nendstream" % content,
            b"%d" % len(content),
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
            len(objs) + 1,
            xref,
        )
        doc = PDFDocument(bytes(out))
        assert doc.page_content(doc.pages()[0]) == content


class TestFilters:
    def test_flate(self):
        payload = b"hello flate " * 10
        s = Stream({"Filter": Name("FlateDecode")}, zlib.compress(payload))
        doc = PDFDocument(_minimal_pdf())
        assert s.decode(doc) == payload

    def test_asciihex(self):
        s = Stream({"Filter": Name("ASCIIHexDecode")}, b"48 65 6C 6C 6F>")
        doc = PDFDocument(_minimal_pdf())
        assert s.decode(doc) == b"Hello"

    def test_filter_chain(self):
        payload = b"chained"
        enc = zlib.compress(payload).hex().encode() + b">"
        s = Stream(
            {"Filter": [Name("ASCIIHexDecode"), Name("FlateDecode")]}, enc
        )
        doc = PDFDocument(_minimal_pdf())
        assert s.decode(doc) == payload

    def test_runlength(self):
        # 3 literal bytes 'abc', then 257-254=3 repeats of 'z', then EOD
        s = Stream({"Filter": Name("RunLengthDecode")}, b"\x02abc\xfez\x80")
        doc = PDFDocument(_minimal_pdf())
        assert s.decode(doc) == b"abczzz"


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Spec-faithful PDF LZW encoder (test oracle for the decoder):
    variable 9→12-bit MSB-first codes, clear 256 / EOD 257, EarlyChange."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [(256, 9)]  # leading clear code
    w = b""
    for byte in data:
        c = w + bytes([byte])
        if c in table:
            w = c
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[c] = next_code
            next_code += 1
            # the encoder's table is ONE entry ahead of the decoder's, so
            # it widens one entry later: at next_code==512 the decoder
            # (len==511) has already widened (EarlyChange=1 boundaries)
            if next_code >= (1 << width) + 1 - early and width < 12:
                width += 1
        w = bytes([byte])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    bitbuf = bitcnt = 0
    out = bytearray()
    for code, wd in codes:
        bitbuf = (bitbuf << wd) | code
        bitcnt += wd
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


class TestLzw:
    def _decode(self, enc: bytes) -> bytes:
        s = Stream({"Filter": Name("LZWDecode")}, enc)
        return s.decode(PDFDocument(_minimal_pdf()))

    def test_roundtrip_simple(self):
        payload = b"the quick brown fox jumps over the lazy dog, twice: " * 2
        assert self._decode(_lzw_encode(payload)) == payload

    def test_kwkwk_self_reference(self):
        # runs of one byte exercise the code==len(table) branch
        payload = b"aaaaaaaaaaaaaaaaaaaaaaaa" + b"bbbbbbbb" + b"a" * 50
        assert self._decode(_lzw_encode(payload)) == payload

    def test_width_growth_early_change(self):
        # >512 table entries forces 9→10-bit transition; EarlyChange=1
        # means the decoder must widen one entry early or desynchronize
        payload = bytes(range(256)) * 4 + b"tail marker"
        assert self._decode(_lzw_encode(payload)) == payload

    def test_early_change_zero(self):
        payload = bytes(range(256)) * 4
        enc = _lzw_encode(payload, early=0)
        s = Stream(
            {"Filter": Name("LZWDecode"), "DecodeParms": {"EarlyChange": 0}}, enc
        )
        assert s.decode(PDFDocument(_minimal_pdf())) == payload

    def test_lzw_content_stream_in_pdf(self):
        """A fixture PDF whose content stream is LZW-encoded (the pre-2005
        crawl-PDF case) parses and extracts text correctly."""
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (LZW legacy stream) Tj ET"
        enc = _lzw_encode(content)
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream"
            % (len(enc), enc),
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
            len(objs) + 1,
            xref,
        )
        doc = PDFDocument(bytes(out))
        assert doc.page_content(doc.pages()[0]) == content
        res = extract_pdf(bytes(out))
        assert res.status == "ok"
        assert res.pages[0].text == "LZW legacy stream"


class TestRealSample:
    """The japanese_test.pdf acid test (SURVEY.md §5.2)."""

    def test_structure(self):
        import os

        if not os.path.exists("/root/reference/japanese_test.pdf"):
            pytest.skip("reference sample not available")
        data = open("/root/reference/japanese_test.pdf", "rb").read()
        doc = PDFDocument(data)
        assert len(doc.xref) == 26
        pages = doc.pages()
        assert len(pages) == 2
        mb = doc.resolve(pages[0]["MediaBox"])
        assert mb == [0, 0, 1003.55, 708.75]
        content = doc.page_content(pages[0])
        assert content.count(b"BT") == 365

"""CCITT T.4/T.6 codec tests: spec vectors, table hygiene, round-trips,
G3 paths, truncation/garbage behavior (kernels/pdf/ccitt.py)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_ocr_spark.kernels.pdf.ccitt import (
    _BLACK_CODES,
    _EXT_CODES,
    _WHITE_CODES,
    _BitWriter,
    _changes_of_row,
    _write_run,
    CcittError,
    decode,
    encode_g4,
)

WHITE, BLACK = 255, 0


def _row(*spans):
    """Build one luma row from (length, is_black) spans."""
    out = bytearray()
    for n, black in spans:
        out += bytes([BLACK if black else WHITE]) * n
    return bytes(out)


class TestSpecVectors:
    """Bit-exact expectations computed by hand from ITU-T T.6."""

    def test_all_white_two_rows(self):
        # each all-white line = one V0 bit ('1'); then EOFB
        enc = encode_g4(bytes([WHITE]) * 16, 8, 2)
        assert enc.hex() == "c0040040"
        assert decode(enc, columns=8, rows=2, k=-1) == (
            8, 2, bytes([WHITE]) * 16
        )

    def test_horizontal_then_v0(self):
        # WWBBWWWW: horizontal(white 2='0111', black 2='11') then V0 + EOFB
        row = _row((2, 0), (2, 1), (4, 0))
        enc = encode_g4(row, 8, 1)
        assert enc.hex() == "2fc0040040"
        assert decode(enc, columns=8, rows=1, k=-1)[2] == row

    def test_black_leading_run(self):
        # line starts black → horizontal codes white run 0 ('00110101')
        row = _row((3, 1), (5, 0))
        enc = encode_g4(row, 8, 1)
        dec = decode(enc, columns=8, rows=1, k=-1)
        assert dec[2] == row

    def test_vertical_offsets(self):
        # second row shifts the black run edge by ±1 → VR1/VL1 paths
        rows = _row((4, 0), (4, 1)) + _row((3, 0), (5, 1)) + _row((5, 0), (3, 1))
        enc = encode_g4(rows, 8, 3)
        assert decode(enc, columns=8, rows=3, k=-1)[2] == rows

    def test_pass_mode(self):
        # ref has a short black island the coding line skips entirely
        rows = _row((2, 0), (2, 1), (12, 0)) + _row((10, 0), (4, 1), (2, 0))
        enc = encode_g4(rows, 16, 2)
        assert decode(enc, columns=16, rows=2, k=-1)[2] == rows


class TestTables:
    def test_prefix_free_per_color(self):
        # MH codes per color (incl. shared extended makeups) are a
        # prefix-free set — the property the probing decoder relies on
        for codes in (_WHITE_CODES, _BLACK_CODES):
            strs = [
                format(val, f"0{bits}b")
                for _, val, bits in codes + _EXT_CODES
            ]
            assert len(set(strs)) == len(strs)
            for a in strs:
                for b in strs:
                    if a is not b:
                        assert not b.startswith(a)

    def test_run_coverage(self):
        runs_w = {r for r, _, _ in _WHITE_CODES}
        runs_b = {r for r, _, _ in _BLACK_CODES}
        assert set(range(64)) <= runs_w and set(range(64)) <= runs_b
        assert {64 * i for i in range(1, 28)} <= runs_w
        assert {64 * i for i in range(1, 28)} <= runs_b
        assert {r for r, _, _ in _EXT_CODES} == {
            1792 + 64 * i for i in range(13)
        }


class TestRoundTrip:
    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def test_random_bitmaps(self, data):
        w = data.draw(st.integers(1, 80))
        h = data.draw(st.integers(1, 24))
        density = data.draw(st.floats(0.0, 1.0))
        seed = data.draw(st.integers(0, 2**16))
        rng = random.Random(seed)
        luma = bytes(
            BLACK if rng.random() < density else WHITE for _ in range(w * h)
        )
        enc = encode_g4(luma, w, h)
        assert decode(enc, columns=w, rows=h, k=-1) == (w, h, luma)

    def test_long_runs_use_makeups(self):
        # 3000-px white run exercises extended makeup chaining
        w = 3000
        row = _row((w - 5, 0), (5, 1))
        enc = encode_g4(row, w, 1)
        assert decode(enc, columns=w, rows=1, k=-1)[2] == row

    def test_rows_unknown_stops_at_eofb(self):
        rows = _row((4, 0), (4, 1)) * 3
        enc = encode_g4(rows, 8, 3)
        w, h, out = decode(enc, columns=8, rows=0, k=-1)
        assert (w, h, out) == (8, 3, rows)


def _encode_g3_1d(luma, width, height, with_eol=True):
    """Minimal T.4 1D encoder (tests only): MH runs per line, optional
    EOL separators."""
    bw = _BitWriter()
    for y in range(height):
        if with_eol:
            bw.write(1, 12)               # EOL = 000000000001
        changes = _changes_of_row(luma[y * width:(y + 1) * width], width, 128)
        pos, color = 0, 0
        for c in changes + [width]:
            if c > width:
                break
            _write_run(bw, c - pos, black=bool(color))
            pos, color = c, color ^ 1
            if pos >= width:
                break
        if pos < width:
            _write_run(bw, width - pos, black=bool(color))
    return bw.done()


class TestGroup3:
    def test_1d_with_eols(self):
        rows = _row((2, 0), (3, 1), (11, 0)) + _row((16, 0),) + _row((1, 1), (15, 0))
        enc = _encode_g3_1d(rows, 16, 3)
        assert decode(enc, columns=16, rows=3, k=0)[2] == rows

    def test_1d_without_eols(self):
        rows = _row((8, 0), (8, 1)) + _row((4, 1), (12, 0))
        enc = _encode_g3_1d(rows, 16, 2, with_eol=False)
        assert decode(enc, columns=16, rows=2, k=0)[2] == rows

    def test_k_positive_1d_tagged(self):
        # K>0: EOL + tag bit 1 (1D line) before every line
        rows = _row((5, 0), (5, 1), (6, 0)) + _row((6, 0), (4, 1), (6, 0))
        bw = _BitWriter()
        for y in range(2):
            bw.write(1, 12)               # EOL
            bw.write(1, 1)                # tag: 1D
            changes = _changes_of_row(rows[y * 16:(y + 1) * 16], 16, 128)
            pos, color = 0, 0
            for c in changes + [16]:
                _write_run(bw, c - pos, black=bool(color))
                pos, color = c, color ^ 1
                if pos >= 16:
                    break
        assert decode(bw.done(), columns=16, rows=2, k=4)[2] == rows


class TestPoison:
    def test_truncated_raises(self):
        rng = random.Random(3)
        luma = bytes(
            BLACK if rng.random() < 0.4 else WHITE for _ in range(64 * 16)
        )
        enc = encode_g4(luma, 64, 16)
        for cut in (1, len(enc) // 3, len(enc) // 2):
            with pytest.raises(CcittError):
                decode(enc[:cut], columns=64, rows=16, k=-1)

    def test_garbage_raises(self):
        rng = random.Random(7)
        for _ in range(50):
            blob = bytes(rng.randrange(256) for _ in range(40))
            try:
                w, h, out = decode(blob, columns=64, rows=0, k=-1)
                assert len(out) == w * h  # tolerated garbage still shaped
            except CcittError:
                pass                      # raising cleanly is the contract

    def test_dimension_caps(self):
        with pytest.raises(CcittError):
            decode(b"\x00", columns=1 << 20, rows=1, k=-1)
        with pytest.raises(CcittError):
            decode(b"\x00", columns=8, rows=1 << 20, k=-1)
        with pytest.raises(CcittError):
            encode_g4(b"", 0, 1)

    def test_wrong_rows_declared(self):
        enc = encode_g4(bytes([WHITE]) * 16, 8, 2)
        with pytest.raises(CcittError):
            decode(enc, columns=8, rows=6, k=-1)


class TestCaptureSite:
    """content.image_ocr_payload: CCITT XObjects arrive at the OCR branch
    as decoded P5 pixels; everything else stays raw."""

    def _first_payload(self, pdf_bytes):
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf

        doc = extract_pdf(pdf_bytes)
        assert doc.status == "ok"
        assert doc.pages[0].needs_ocr
        return doc.pages[0].ocr_payload

    def test_ccitt_xobject_decodes_to_p5(self):
        from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_ccitt
        from pdf_ocr_spark.kernels.ocr_stub import StubOcrEngine
        from pdf_ocr_spark.kernels.pdf.raster import parse_pgm

        payload = self._first_payload(make_scan_pdf_ccitt(["fax line one\nfax line two"]))
        assert payload.startswith(b"P5\n")
        w, h, px = parse_pgm(payload)
        assert w * h == len(px)
        recog = StubOcrEngine().recognize_batch([payload])[0]
        assert [t for t, _ in recog] == ["fax line one", "fax line two"]

    def test_flate_ccitt_chain(self):
        from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_ccitt
        from pdf_ocr_spark.kernels.ocr_stub import StubOcrEngine

        payload = self._first_payload(
            make_scan_pdf_ccitt(["chained"], flate_wrap=True)
        )
        assert payload.startswith(b"P5\n")
        assert StubOcrEngine().recognize_batch([payload])[0][0][0] == "chained"

    def test_truncated_stream_falls_back_to_raw(self):
        from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_ccitt
        from pdf_ocr_spark.kernels.ocr_stub import StubOcrEngine

        payload = self._first_payload(
            make_scan_pdf_ccitt(["gone"], corrupt_page=1)
        )
        assert not payload.startswith(b"P5\n")  # opaque-bytes fallback
        recog = StubOcrEngine().recognize_batch([payload])[0]
        assert recog[0][0].startswith("[unrecognized image ")

    def test_jpeg_payload_still_raw(self):
        from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_jpeg

        payload = self._first_payload(make_scan_pdf_jpeg(["dct page"]))
        assert payload[:3] == b"\xff\xd8\xff"  # DCT bytes pass through

    def test_raster_blits_ccitt_pixels(self):
        from pdf_ocr_spark.fixtures.genpages import make_scan_pdf_ccitt
        from pdf_ocr_spark.kernels.pdf.extract import extract_pdf
        from pdf_ocr_spark.kernels.pdf.raster import parse_pgm, rasterize_page
        from pdf_ocr_spark.kernels.pdf.content import interpret_page
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        pdf = make_scan_pdf_ccitt(["raster me\nraster me harder"])
        doc = PDFDocument(pdf)
        res = interpret_page(doc, doc.pages()[0])
        pgm = rasterize_page(
            res.glyphs, res.rules, res.image_draws, res.width, res.height,
            image_payloads=res.images,
        )
        _, _, px = parse_pgm(pgm)
        # decoded fax ink must land in the bitmap (not a flat fill):
        # both black and white pixels present in the image area
        assert 0 in px and 255 in px

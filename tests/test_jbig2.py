"""From-scratch JBIG2 codec (kernels/pdf/jbig2.py): generic-region
template-0 arithmetic coding with TPGDON, embedded-PDF segment framing,
lossless round-trips, truncation/corruption fuzz, and the JBIG2Decode
scan branch through the extraction pipeline (reference behavior: real
pixmaps rendered and OCRed whatever codec the PDF carries,
/root/reference/pdf_ocr_with_boxes_v2.py:200-247)."""

import random

import numpy as np
import pandas as pd
import pytest

from pdf_ocr_spark.kernels.pdf.jbig2 import (
    JBIG2Error,
    decode_bilevel,
    encode_bilevel,
)


class TestRoundTrip:
    @pytest.mark.parametrize("w,h", [(1, 1), (7, 3), (64, 64), (33, 47),
                                     (128, 20), (256, 8)])
    def test_random_bilevel(self, w, h):
        rng = np.random.RandomState(w * 100 + h)
        luma = (rng.randint(0, 2, size=w * h) * 255).astype(np.uint8).tobytes()
        assert decode_bilevel(encode_bilevel(w, h, luma)) == (w, h, luma)

    def test_all_white_and_all_black(self):
        for fill in (0, 255):
            luma = bytes([fill]) * (40 * 30)
            assert decode_bilevel(encode_bilevel(40, 30, luma)) == (40, 30, luma)

    def test_grayscale_thresholds_at_128(self):
        luma = bytes([0, 127, 128, 255])
        w, h, out = decode_bilevel(encode_bilevel(4, 1, luma))
        assert out == bytes([0, 0, 255, 255])

    def test_typical_rows_compress(self):
        """TPGDON: a tall repeated-row image codes in almost no bytes."""
        row = (b"\x00" * 32 + b"\xff" * 32)
        tall = row * 256
        data = encode_bilevel(64, 256, tall)
        assert len(data) < 200
        assert decode_bilevel(data) == (64, 256, tall)

    def test_marker_image_round_trip(self):
        from pdf_ocr_spark.kernels.pixelcode import pixels_to_text, text_to_pixels

        w, h, px = text_to_pixels("jbig2 codec\npixel marker")
        w2, h2, out = decode_bilevel(encode_bilevel(w, h, px))
        assert (w2, h2, out) == (w, h, px)
        assert pixels_to_text(w2, h2, out) == "jbig2 codec\npixel marker"


class TestValidation:
    def test_rejects_bad_dims(self):
        with pytest.raises(JBIG2Error):
            encode_bilevel(0, 4, b"")
        with pytest.raises(JBIG2Error):
            encode_bilevel(2, 2, b"abc")

    def test_rejects_garbage(self):
        with pytest.raises(JBIG2Error):
            decode_bilevel(b"")
        with pytest.raises(JBIG2Error):
            decode_bilevel(b"\x00" * 64)
        with pytest.raises(JBIG2Error):
            decode_bilevel(b"%PDF-1.4 not jbig2 at all........")

    def test_rejects_region_without_page(self):
        data = encode_bilevel(8, 8, bytes(64))
        # strip the page-info segment (number 0): its header is 11
        # bytes + 19 data bytes
        with pytest.raises(JBIG2Error):
            decode_bilevel(data[30:])


class TestFuzz:
    def _sample(self):
        rng = np.random.RandomState(3)
        luma = (rng.randint(0, 2, size=48 * 40) * 255).astype(np.uint8).tobytes()
        return encode_bilevel(48, 40, luma)

    def test_truncations_raise_jbig2error(self):
        data = self._sample()
        rng = random.Random(17)
        for _ in range(100):
            cut = rng.randrange(1, len(data))
            try:
                decode_bilevel(data[:cut])
            except JBIG2Error:
                pass

    def test_bit_flips_never_escape(self):
        data = self._sample()
        rng = random.Random(23)
        for _ in range(100):
            b = bytearray(data)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                decode_bilevel(bytes(b))
            except JBIG2Error:
                pass   # wrong pixels are fine; other exceptions are not


class TestPipelineIntegration:
    def test_jbig2_scan_branch_end_to_end(self):
        from pdf_ocr_spark.fixtures.genpages import gen_jbig2_scan_rows
        from pdf_ocr_spark.pipeline.extract_job import extract_batch, ocr_batch

        rows = gen_jbig2_scan_rows()
        batch = pd.DataFrame({"url": [r["url"] for r in rows],
                              "html": [bytes(r["html"]) for r in rows]})
        pages = pd.concat(list(extract_batch(iter([batch]))),
                          ignore_index=True)
        pages = pd.concat(list(ocr_batch(iter([pages]))), ignore_index=True)
        assert (pages["status"] == "ok").all()
        assert pages["needs_ocr"].all()
        by_url = pages.set_index(["url", "page"])["page_text"]
        for d, row in enumerate(rows):
            for p in range(1, 1 + (1 + d % 3)):
                text = str(by_url[(row["url"], p)])
                if d == len(rows) - 1 and p == 1:
                    assert text.startswith("[unrecognized image ")
                else:
                    assert text.startswith(f"jbig2 doc {d} page {p}")

"""From-scratch JBIG2 codec (the PDF ``JBIG2Decode`` filter).

JBIG2 (ITU-T T.88 / ISO 14492) is the bi-level codec of high-compression
scanned PDFs (Xerox-class scanner output, Google Books era archives).
The reference renders real pixmaps whatever the codec
(/root/reference/pdf_ocr_with_boxes_v2.py:200-247); with this module all
FOUR real-world scan codecs (DCT, CCITT, JPX, JBIG2) reach the OCR
branch and the rasterizer as real decoded pixels.

Scope — the generic-region profile, implemented on BOTH sides so
fixtures are deterministic:

* embedded-PDF segment organization (no file header): segment headers
  (§7.2), page information (§7.4.8), immediate (lossless) generic
  region (§7.4.6), end-of-page/file ignored
* generic region decoding (§6.2): arithmetic template 0 with the
  nominal AT pixel positions, TPGDON typical-prediction rows, OR
  composition onto the page bitmap
* the MQ arithmetic coder is shared with the JPEG 2000 kernel
  (kernels/pdf/jp2.py) — JBIG2 and JPEG 2000 specify the identical
  coder; here every one of the 2^16 template contexts starts at state
  0 / MPS 0 per §6.2.5.3 (JBIG2 has no preset context table)

Out of scope (→ loud ``JBIG2Error``): MMR-coded regions (PDF carries
those as CCITT streams anyway), symbol dictionaries / text regions,
halftones, refinement, unknown-length regions, JBIG2Globals.

The 16-bit template context packs the nominal template-0 neighbourhood
in raster order (sorted by (y, x), MSB first) — the convention of the
open-source decoders (pdf.js's jbig2 coder builds the identical
reordered template).  Encoder and decoder are exact mirrors; pinned by
lossless round-trips, truncation fuzz, and frozen pipeline goldens.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pdf_ocr_spark.kernels.pdf.jp2 import MQDecoder, MQEncoder


class JBIG2Error(ValueError):
    """Malformed / truncated / unsupported JBIG2 data."""


# nominal template-0 neighbourhood: fixed pixels + nominal AT1..AT4,
# sorted raster order (y, then x); each entry is (dy, dx)
_TEMPLATE0: Tuple[Tuple[int, int], ...] = tuple(sorted([
    (-2, -1), (-2, 0), (-2, 1),                    # fixed, row y-2
    (-2, 2), (-2, -2),                             # AT3, AT4 (nominal)
    (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),  # fixed, row y-1
    (-1, 3), (-1, -3),                             # AT1, AT2 (nominal)
    (0, -4), (0, -3), (0, -2), (0, -1),            # fixed, current row
]))

# TPGDON pseudo-pixel context for template 0 (T.88 §6.2.5.7)
_TPGD_CTX0 = 0x9B25

_NOMINAL_AT = bytes([0x03, 0xFF, 0xFD, 0xFF, 0x02, 0xFE, 0xFE, 0xFE])

_SEG_PAGE_INFO = 48
_SEG_END_OF_PAGE = 49
_SEG_END_OF_FILE = 51
_SEG_GENERIC_IMMEDIATE = 38
_SEG_GENERIC_IMMEDIATE_LOSSLESS = 39


class _Ctx(dict):
    """Lazily-allocated per-context [state, mps] table (2^16 ids)."""

    def __missing__(self, key):
        v = [0, 0]
        self[key] = v
        return v


def _context(bits: bytearray, w: int, h: int, x: int, y: int) -> int:
    cx = 0
    for dy, dx in _TEMPLATE0:
        yy = y + dy
        xx = x + dx
        cx <<= 1
        if 0 <= yy < h and 0 <= xx < w and bits[yy * w + xx]:
            cx |= 1
    return cx


def _u32(v: int) -> bytes:
    return v.to_bytes(4, "big")


def _segment(number: int, seg_type: int, page: int, data: bytes) -> bytes:
    """One segment with the short header forms (no referred segments)."""
    return (_u32(number) + bytes([seg_type & 0x3F]) + b"\x00" +
            bytes([page]) + _u32(len(data)) + data)


def encode_bilevel(width: int, height: int, luma: bytes) -> bytes:
    """Encode an 8-bit grayscale buffer (thresholded at 128: dark=ink)
    as an embedded-PDF JBIG2 stream: page info + one immediate lossless
    generic region (template 0, TPGDON) + end-of-page."""
    if width <= 0 or height <= 0 or len(luma) != width * height:
        raise JBIG2Error("bad image dimensions")
    bits = bytearray(1 if b < 128 else 0 for b in luma)
    ctx = _Ctx()
    mq = MQEncoder(states=ctx)
    ltp = 0
    prev = bytearray(width)      # the virtual all-zero row above row 0
    for y in range(height):
        row = bits[y * width:(y + 1) * width]
        typical = 1 if row == prev else 0
        # SLTP is the TOGGLE of the typical-prediction state, not the
        # state itself (T.88 §6.2.5.7: LTP ^= SLTP per row)
        mq.encode(typical ^ ltp, _TPGD_CTX0)
        ltp = typical
        prev = row
        if ltp:
            continue             # decoder copies the row above
        base = y * width
        for x in range(width):
            mq.encode(bits[base + x], _context(bits, width, height, x, y))
    data = mq.flush()
    page_info = (_u32(width) + _u32(height) + _u32(0) + _u32(0) +
                 bytes([0x01]) + b"\x00\x00")
    region = (_u32(width) + _u32(height) + _u32(0) + _u32(0) +
              bytes([0x00]) +          # external combination op: OR
              bytes([0x08]) +          # MMR=0, template 0, TPGDON=1
              _NOMINAL_AT + data)
    return (_segment(0, _SEG_PAGE_INFO, 1, page_info) +
            _segment(1, _SEG_GENERIC_IMMEDIATE_LOSSLESS, 1, region) +
            _segment(2, _SEG_END_OF_PAGE, 1, b""))


def _parse_segment_header(data: bytes, pos: int) -> Tuple[int, int, int, int]:
    """→ (seg_type, data_length, data_start, next_header_pos)."""
    if pos + 11 > len(data):
        raise JBIG2Error("truncated segment header")
    number = int.from_bytes(data[pos:pos + 4], "big")
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    p = pos + 5
    rts = data[p]
    count = rts >> 5
    if count == 7:
        if p + 4 > len(data):
            raise JBIG2Error("truncated referred-to count")
        count = int.from_bytes(data[p:p + 4], "big") & 0x1FFFFFFF
        p += 4 + (count + 8) // 8        # long form + retain bits
    else:
        p += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    p += count * ref_size
    p += 4 if page_assoc_4 else 1
    if p + 4 > len(data):
        raise JBIG2Error("truncated segment data length")
    length = int.from_bytes(data[p:p + 4], "big")
    p += 4
    if length == 0xFFFFFFFF:
        raise JBIG2Error("unknown-length segments unsupported")
    if p + length > len(data):
        raise JBIG2Error("truncated segment data")
    return seg_type, length, p, p + length


def _decode_generic(body: bytes, page: bytearray,
                    pw: int, ph: int) -> None:
    if len(body) < 17 + 1 + 8:
        raise JBIG2Error("short generic region segment")
    rw = int.from_bytes(body[0:4], "big")
    rh = int.from_bytes(body[4:8], "big")
    rx = int.from_bytes(body[8:12], "big")
    ry = int.from_bytes(body[12:16], "big")
    gflags = body[17]
    if gflags & 0x01:
        raise JBIG2Error("MMR-coded generic regions unsupported")
    if (gflags >> 1) & 0x03 != 0:
        raise JBIG2Error("only generic template 0 supported")
    tpgdon = bool(gflags & 0x08)
    at = body[18:26]
    if at != _NOMINAL_AT:
        raise JBIG2Error("non-nominal AT pixels unsupported")
    if rx + rw > pw or ry + rh > ph:
        raise JBIG2Error("region exceeds page")
    if rw == 0 or rh == 0 or rw * rh > 64 << 20:
        raise JBIG2Error("unreasonable region size")
    mq = MQDecoder(body[26:], states=_Ctx())
    bits = bytearray(rw * rh)
    ltp = 0
    for y in range(rh):
        ltp ^= mq.decode(_TPGD_CTX0)
        base = y * rw
        if ltp:
            if y == 0:
                continue        # copy of the (all-zero) virtual row
            bits[base:base + rw] = bits[base - rw:base]
            continue
        for x in range(rw):
            if mq.decode(_context(bits, rw, rh, x, y)):
                bits[base + x] = 1
    for y in range(rh):
        src = y * rw
        dst = (ry + y) * pw + rx
        for x in range(rw):
            if bits[src + x]:
                page[dst + x] = 1      # OR composition


def decode_bilevel(data: bytes) -> Tuple[int, int, bytes]:
    """Decode an embedded-PDF JBIG2 stream → (w, h, luma 0/255)."""
    data = bytes(data)
    pos = 0
    pw = ph = None
    page: bytearray = bytearray()
    saw_region = False
    while pos < len(data):
        seg_type, length, start, nxt = _parse_segment_header(data, pos)
        body = data[start:start + length]
        if seg_type == _SEG_PAGE_INFO:
            if len(body) < 19:
                raise JBIG2Error("short page info")
            pw = int.from_bytes(body[0:4], "big")
            ph = int.from_bytes(body[4:8], "big")
            if not (0 < pw <= 1 << 16 and 0 < ph <= 1 << 16):
                raise JBIG2Error("unreasonable page dimensions")
            page = bytearray(pw * ph)
        elif seg_type in (_SEG_GENERIC_IMMEDIATE,
                          _SEG_GENERIC_IMMEDIATE_LOSSLESS):
            if pw is None:
                raise JBIG2Error("generic region before page info")
            _decode_generic(body, page, pw, ph)
            saw_region = True
        elif seg_type in (_SEG_END_OF_PAGE, _SEG_END_OF_FILE, 50, 62):
            pass                        # end-of-stripe/extension: ignore
        else:
            raise JBIG2Error(f"unsupported segment type {seg_type}")
        pos = nxt
    if pw is None or not saw_region:
        raise JBIG2Error("no page/region segments")
    return pw, ph, bytes(0 if b else 255 for b in page)

"""From-scratch CCITT Group 3 / Group 4 fax codec — ITU-T T.4 / T.6.

CCITTFaxDecode is the dominant codec of real-world SCANNED PDFs (fax
archives, book scans, office copiers emit G4 almost universally); until
now those streams flowed to the OCR branch as opaque bytes
(kernels/pdf/cos.py — image codecs pass through).  The reference
renders real pixmaps and OCRs real pixels
(/root/reference/pdf_ocr_with_boxes_v2.py:200-209); this module makes
the scan branch process ACTUAL bilevel image content, the same upgrade
kernels/pdf/jpeg.py made for DCTDecode.

* :func:`decode` — G4 (``K < 0``, pure 2D/MMR — what PDF producers
  emit), G3 1D (``K = 0``, MH run lengths) and G3 mixed (``K > 0``,
  EOL+tag-bit switched 1D/2D) → 8-bit luma rows (black=0, white=255).
  Honors ``/Columns``, ``/Rows``, ``/EncodedByteAlign``; tolerates
  leading fill bits + EOLs and the EOFB/RTC terminators.
* :func:`encode_g4` — T.6 encoder (pass/horizontal/vertical modes over
  the same shared MH tables) used by the fixture generator, so
  encode→decode round-trips pin the table constants from both sides.

Everything is bounded and no-surprise: malformed/truncated input raises
:class:`CcittError` (never hangs — the bit cursor strictly advances;
never over-allocates — dimensions are capped), matching the kernel
no-raise-at-callsite discipline: callers catch CcittError and fall back
to the opaque-bytes path.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, List, Tuple

__all__ = ["CcittError", "decode", "encode_g4"]


class CcittError(ValueError):
    """Malformed, truncated, or unsupported CCITT input."""


MAX_COLUMNS = 1 << 16        # poison caps, same spirit as jpeg.py
MAX_ROWS = 1 << 16
MAX_PIXELS = 1 << 26

# ---------------------------------------------------------------------------
# Modified-Huffman run-length tables (ITU-T T.4 §4.1, tables 2/3/4).
# Entries are (run, code_value, code_bits) with codes read MSB-first.
# The same tables serve the decoder and the encoder, so round-trip tests
# exercise every constant from both directions.

_WHITE_CODES: Tuple[Tuple[int, int, int], ...] = (
    (0, 0x35, 8), (1, 0x07, 6), (2, 0x07, 4), (3, 0x08, 4),
    (4, 0x0B, 4), (5, 0x0C, 4), (6, 0x0E, 4), (7, 0x0F, 4),
    (8, 0x13, 5), (9, 0x14, 5), (10, 0x07, 5), (11, 0x08, 5),
    (12, 0x08, 6), (13, 0x03, 6), (14, 0x34, 6), (15, 0x35, 6),
    (16, 0x2A, 6), (17, 0x2B, 6), (18, 0x27, 7), (19, 0x0C, 7),
    (20, 0x08, 7), (21, 0x17, 7), (22, 0x03, 7), (23, 0x04, 7),
    (24, 0x28, 7), (25, 0x2B, 7), (26, 0x13, 7), (27, 0x24, 7),
    (28, 0x18, 7), (29, 0x02, 8), (30, 0x03, 8), (31, 0x1A, 8),
    (32, 0x1B, 8), (33, 0x12, 8), (34, 0x13, 8), (35, 0x14, 8),
    (36, 0x15, 8), (37, 0x16, 8), (38, 0x17, 8), (39, 0x28, 8),
    (40, 0x29, 8), (41, 0x2A, 8), (42, 0x2B, 8), (43, 0x2C, 8),
    (44, 0x2D, 8), (45, 0x04, 8), (46, 0x05, 8), (47, 0x0A, 8),
    (48, 0x0B, 8), (49, 0x52, 8), (50, 0x53, 8), (51, 0x54, 8),
    (52, 0x55, 8), (53, 0x24, 8), (54, 0x25, 8), (55, 0x58, 8),
    (56, 0x59, 8), (57, 0x5A, 8), (58, 0x5B, 8), (59, 0x4A, 8),
    (60, 0x4B, 8), (61, 0x32, 8), (62, 0x33, 8), (63, 0x34, 8),
    # makeup codes (multiples of 64)
    (64, 0x1B, 5), (128, 0x12, 5), (192, 0x17, 6), (256, 0x37, 7),
    (320, 0x36, 8), (384, 0x37, 8), (448, 0x64, 8), (512, 0x65, 8),
    (576, 0x68, 8), (640, 0x67, 8), (704, 0xCC, 9), (768, 0xCD, 9),
    (832, 0xD2, 9), (896, 0xD3, 9), (960, 0xD4, 9), (1024, 0xD5, 9),
    (1088, 0xD6, 9), (1152, 0xD7, 9), (1216, 0xD8, 9), (1280, 0xD9, 9),
    (1344, 0xDA, 9), (1408, 0xDB, 9), (1472, 0x98, 9), (1536, 0x99, 9),
    (1600, 0x9A, 9), (1664, 0x18, 6), (1728, 0x9B, 9),
)

_BLACK_CODES: Tuple[Tuple[int, int, int], ...] = (
    (0, 0x37, 10), (1, 0x02, 3), (2, 0x03, 2), (3, 0x02, 2),
    (4, 0x03, 3), (5, 0x03, 4), (6, 0x02, 4), (7, 0x03, 5),
    (8, 0x05, 6), (9, 0x04, 6), (10, 0x04, 7), (11, 0x05, 7),
    (12, 0x07, 7), (13, 0x04, 8), (14, 0x07, 8), (15, 0x18, 9),
    (16, 0x17, 10), (17, 0x18, 10), (18, 0x08, 10), (19, 0x67, 11),
    (20, 0x68, 11), (21, 0x6C, 11), (22, 0x37, 11), (23, 0x28, 11),
    (24, 0x17, 11), (25, 0x18, 11), (26, 0xCA, 12), (27, 0xCB, 12),
    (28, 0xCC, 12), (29, 0xCD, 12), (30, 0x68, 12), (31, 0x69, 12),
    (32, 0x6A, 12), (33, 0x6B, 12), (34, 0xD2, 12), (35, 0xD3, 12),
    (36, 0xD4, 12), (37, 0xD5, 12), (38, 0xD6, 12), (39, 0xD7, 12),
    (40, 0x6C, 12), (41, 0x6D, 12), (42, 0xDA, 12), (43, 0xDB, 12),
    (44, 0x54, 12), (45, 0x55, 12), (46, 0x56, 12), (47, 0x57, 12),
    (48, 0x64, 12), (49, 0x65, 12), (50, 0x52, 12), (51, 0x53, 12),
    (52, 0x24, 12), (53, 0x37, 12), (54, 0x38, 12), (55, 0x27, 12),
    (56, 0x28, 12), (57, 0x58, 12), (58, 0x59, 12), (59, 0x2B, 12),
    (60, 0x2C, 12), (61, 0x5A, 12), (62, 0x66, 12), (63, 0x67, 12),
    # makeup codes
    (64, 0x0F, 10), (128, 0xC8, 12), (192, 0xC9, 12), (256, 0x5B, 12),
    (320, 0x33, 12), (384, 0x34, 12), (448, 0x35, 12), (512, 0x6C, 13),
    (576, 0x6D, 13), (640, 0x4A, 13), (704, 0x4B, 13), (768, 0x4C, 13),
    (832, 0x4D, 13), (896, 0x72, 13), (960, 0x73, 13), (1024, 0x74, 13),
    (1088, 0x75, 13), (1152, 0x76, 13), (1216, 0x77, 13), (1280, 0x52, 13),
    (1344, 0x53, 13), (1408, 0x54, 13), (1472, 0x55, 13), (1536, 0x5A, 13),
    (1600, 0x5B, 13), (1664, 0x64, 13), (1728, 0x65, 13),
)

# extended makeup codes shared by both colors (T.4 table 4, 1792-2560)
_EXT_CODES: Tuple[Tuple[int, int, int], ...] = (
    (1792, 0x08, 11), (1856, 0x0C, 11), (1920, 0x0D, 11),
    (1984, 0x12, 12), (2048, 0x13, 12), (2112, 0x14, 12),
    (2176, 0x15, 12), (2240, 0x16, 12), (2304, 0x17, 12),
    (2368, 0x1C, 12), (2432, 0x1D, 12), (2496, 0x1E, 12),
    (2560, 0x1F, 12),
)


def _decode_table(
    codes: Tuple[Tuple[int, int, int], ...]
) -> Dict[Tuple[int, int], int]:
    table: Dict[Tuple[int, int], int] = {}
    for run, val, bits in codes + _EXT_CODES:
        table[(bits, val)] = run
    return table


_WHITE_DECODE = _decode_table(_WHITE_CODES)
_BLACK_DECODE = _decode_table(_BLACK_CODES)
_WHITE_ENCODE = {run: (val, bits) for run, val, bits in _WHITE_CODES}
_BLACK_ENCODE = {run: (val, bits) for run, val, bits in _BLACK_CODES}
_EXT_ENCODE = {run: (val, bits) for run, val, bits in _EXT_CODES}

_MIN_WHITE_BITS, _MAX_WHITE_BITS = 4, 12
_MIN_BLACK_BITS, _MAX_BLACK_BITS = 2, 13


class _BitReader:
    """MSB-first bit cursor over bytes; every read strictly advances or
    raises, so decode loops terminate on any input."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit offset
        self.nbits = len(data) * 8

    def peek(self, n: int) -> int:
        """Next ``n`` bits (zero-padded past end-of-data)."""
        out = 0
        p = self.pos
        for _ in range(n):
            if p < self.nbits:
                out = (out << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            else:
                out <<= 1
            p += 1
        return out

    def skip(self, n: int) -> None:
        self.pos += n

    def exhausted(self) -> bool:
        return self.pos >= self.nbits

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_run(self, black: bool) -> int:
        """One complete MH run length: zero or more makeup codes then a
        terminating code (< 64)."""
        total = 0
        table = _BLACK_DECODE if black else _WHITE_DECODE
        lo = _MIN_BLACK_BITS if black else _MIN_WHITE_BITS
        hi = _MAX_BLACK_BITS if black else _MAX_WHITE_BITS
        for _ in range(64):               # >64 chained makeups = garbage
            run = -1
            for bits in range(lo, hi + 1):
                v = table.get((bits, self.peek(bits)))
                if v is not None:
                    self.skip(bits)
                    run = v
                    break
            if run < 0:
                raise CcittError("bad MH code")
            total += run
            if run < 64:                  # terminating code ends the run
                return total
        raise CcittError("runaway MH makeup chain")


def _find_b(ref: List[int], a0: int, color: int) -> Tuple[int, int]:
    """(b1, b2) per T.4 §4.2.1.3.1: b1 = first changing element of the
    reference line strictly right of ``a0`` whose top-to-bottom color
    change matches the coding color; b2 = the next one after b1.

    ``ref`` holds changing-element positions (alternating white→black,
    black→white, starting white→black) padded with sentinel ``columns``
    entries; ``color`` is the color left of the sought b1 (0=white)."""
    i = bisect_right(ref, a0)
    # even-index elements are white→black transitions: that is b1's
    # required direction when the coding color is white (and vice versa)
    if (i & 1) != color:
        i += 1
    if i >= len(ref):
        last = ref[-1] if ref else 0
        return last, last
    b1 = ref[i]
    b2 = ref[i + 1] if i + 1 < len(ref) else b1
    return b1, b2


def _line_to_runs(changes: List[int], columns: int) -> bytes:
    """Changing-element positions → one luma row (black=0, white=255)."""
    row = bytearray(b"\xff" * columns)
    it = iter(changes)
    for start in it:
        end = next(it, columns)
        if start >= columns:
            break
        row[start:min(end, columns)] = b"\x00" * (min(end, columns) - start)
    return bytes(row)


_PASS, _HORIZ = object(), object()


def _read_mode(br: _BitReader) -> Tuple[object, int]:
    """One 2D mode code → (mode, vertical offset). Modes: vertical
    (int offset −3..+3), pass, horizontal."""
    if br.peek(1) == 1:
        br.skip(1)
        return ("V", 0)
    if br.peek(3) == 0b011:
        br.skip(3)
        return ("V", 1)
    if br.peek(3) == 0b010:
        br.skip(3)
        return ("V", -1)
    if br.peek(3) == 0b001:
        br.skip(3)
        return (_HORIZ, 0)
    if br.peek(4) == 0b0001:
        br.skip(4)
        return (_PASS, 0)
    if br.peek(6) == 0b000011:
        br.skip(6)
        return ("V", 2)
    if br.peek(6) == 0b000010:
        br.skip(6)
        return ("V", -2)
    if br.peek(7) == 0b0000011:
        br.skip(7)
        return ("V", 3)
    if br.peek(7) == 0b0000010:
        br.skip(7)
        return ("V", -3)
    raise CcittError("bad 2D mode code")


def _decode_2d_line(br: _BitReader, ref: List[int], columns: int) -> List[int]:
    """One 2D-coded line against reference changing elements ``ref`` →
    this line's changing elements (positions ≤ columns, even-length)."""
    cur: List[int] = []
    a0 = -1
    color = 0                             # 0 = white
    while a0 < columns:
        b1, b2 = _find_b(ref, a0, color)
        mode, dv = _read_mode(br)
        if mode is _PASS:
            a0 = b2                       # color unchanged, no element
        elif mode is _HORIZ:
            start = a0 if a0 > 0 else 0
            r1 = br.read_run(black=bool(color))
            r2 = br.read_run(black=not bool(color))
            cur.append(min(start + r1, columns))
            cur.append(min(start + r1 + r2, columns))
            a0 = start + r1 + r2
        else:                             # vertical
            a1 = b1 + dv
            if a1 < 0 or a1 > columns or (a0 >= 0 and a1 <= a0):
                raise CcittError("non-monotonic vertical mode")
            cur.append(a1)
            a0 = a1
            color ^= 1
        if len(cur) > 2 * columns + 4:
            raise CcittError("changing-element overflow")
    if len(cur) % 2:
        cur.append(columns)
    return cur


def _decode_1d_line(br: _BitReader, columns: int) -> List[int]:
    """One MH (1D) line → changing elements.  Lines start white."""
    cur: List[int] = []
    pos = 0
    color = 0
    while pos < columns:
        run = br.read_run(black=bool(color))
        pos += run
        cur.append(min(pos, columns))
        color ^= 1
        if len(cur) > 2 * columns + 4:
            raise CcittError("changing-element overflow")
    if len(cur) % 2:
        cur.append(columns)
    return cur


def _try_skip_eol(br: _BitReader) -> bool:
    """Consume fill bits + one EOL (≥11 zeros then a 1) if present at the
    cursor; returns True when an EOL was consumed."""
    zeros = 0
    p = br.pos
    while p < br.nbits and not (br.data[p >> 3] >> (7 - (p & 7))) & 1:
        zeros += 1
        p += 1
        if zeros > 64:                    # fill is byte-padding scale
            return False
    if zeros >= 11 and p < br.nbits:
        br.pos = p + 1                    # consume through the 1 bit
        return True
    return False


def decode(
    data: bytes,
    columns: int = 1728,
    rows: int = 0,
    k: int = -1,
    encoded_byte_align: bool = False,
) -> Tuple[int, int, bytes]:
    """Decode a CCITT bitstream → ``(width, height, luma)`` with luma
    row-major, black=0, white=255 (the P5 convention raster.py uses).

    ``rows`` = 0 decodes until EOFB/RTC or data exhaustion (PDF streams
    normally carry /Rows; scanners always set it).  ``k`` follows the
    PDF /K convention: negative = G4, zero = G3 1D, positive = G3 2D.
    """
    if not 0 < columns <= MAX_COLUMNS:
        raise CcittError(f"bad columns {columns}")
    if rows < 0 or rows > MAX_ROWS or (rows and rows * columns > MAX_PIXELS):
        raise CcittError(f"bad rows {rows}")
    br = _BitReader(data)
    out: List[bytes] = []
    ref = [columns, columns]              # imaginary all-white line above
    max_rows = rows if rows else MAX_PIXELS // columns

    if k < 0:                             # --- Group 4 (T.6) ---
        while len(out) < max_rows:
            if encoded_byte_align:
                br.align()
            if br.exhausted():
                break
            if br.peek(24) == 0x001001:   # EOFB = two EOLs
                break
            try:
                cur = _decode_2d_line(br, ref, columns)
            except CcittError:
                if out and not rows:      # trailing byte-padding, no /Rows
                    break
                raise
            out.append(_line_to_runs(cur, columns))
            ref = cur + [columns, columns]
    elif k == 0:                          # --- Group 3 one-dimensional ---
        while len(out) < max_rows:
            if encoded_byte_align:
                br.align()
            while _try_skip_eol(br):      # optional EOLs between lines
                pass
            if br.exhausted():
                break
            try:
                cur = _decode_1d_line(br, columns)
            except CcittError:
                if out:                   # trailing RTC garbage after data
                    break
                raise
            out.append(_line_to_runs(cur, columns))
    else:                                 # --- Group 3 two-dimensional ---
        while len(out) < max_rows:
            if encoded_byte_align:
                br.align()
            saw_eol = False
            while _try_skip_eol(br):
                saw_eol = True
                # tag bit follows each EOL: 1 = next line 1D, 0 = 2D
                break
            one_dimensional = True
            if saw_eol:
                tag = br.peek(1)
                br.skip(1)
                one_dimensional = tag == 1
            elif out:
                # K>0 requires EOL+tag before every line after the first
                break
            if br.exhausted():
                break
            try:
                cur = (
                    _decode_1d_line(br, columns)
                    if one_dimensional
                    else _decode_2d_line(br, ref, columns)
                )
            except CcittError:
                if out:
                    break
                raise
            out.append(_line_to_runs(cur, columns))
            ref = cur + [columns, columns]

    if not out:
        raise CcittError("no decodable lines")
    if rows and len(out) < rows:
        raise CcittError(f"truncated: {len(out)}/{rows} rows")
    return columns, len(out), b"".join(out)


# ---------------------------------------------------------------------------
# T.6 encoder (fixtures + round-trip tests)


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nacc += bits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)

    def done(self) -> bytes:
        if self.nacc:
            self.buf.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = self.nacc = 0
        return bytes(self.buf)


def _write_run(bw: _BitWriter, run: int, black: bool) -> None:
    table = _BLACK_ENCODE if black else _WHITE_ENCODE
    while run > 2623:
        val, bits = _EXT_ENCODE[2560]
        bw.write(val, bits)
        run -= 2560
    if run >= 64:
        makeup = (run // 64) * 64
        if makeup > 1728:
            val, bits = _EXT_ENCODE[makeup]
        else:
            val, bits = table[makeup]
        bw.write(val, bits)
        run -= makeup
    val, bits = table[run]
    bw.write(val, bits)


def _changes_of_row(row: bytes, columns: int, threshold: int) -> List[int]:
    changes: List[int] = []
    color = 0                             # white
    for x in range(columns):
        px_black = row[x] < threshold
        if px_black != bool(color):
            changes.append(x)
            color ^= 1
    return changes


def encode_g4(
    luma: bytes, width: int, height: int, threshold: int = 128
) -> bytes:
    """Encode 8-bit luma (black < threshold) as a T.6 (G4) bitstream with
    EOFB, the exact stream a ``/Filter /CCITTFaxDecode /K -1`` PDF image
    carries."""
    if width <= 0 or height <= 0 or len(luma) < width * height:
        raise CcittError("bad encode dimensions")
    bw = _BitWriter()
    _encode_g4_into(bw, luma, width, height, threshold)
    bw.write(0x001001, 24)                # EOFB
    return bw.done()


def _encode_g4_into(
    bw: "_BitWriter", luma: bytes, width: int, height: int,
    threshold: int = 128,
) -> None:
    """One G4 image's 2D lines into an open bit writer (no EOFB) —
    shared by :func:`encode_g4` and the multi-plane chain."""
    ref = [width, width]
    for y in range(height):
        row = luma[y * width : (y + 1) * width]
        cur = _changes_of_row(row, width, threshold)
        work = cur + [width, width]
        a0 = -1
        color = 0
        i = 0                             # index of a1 in work
        while a0 < width:
            b1, b2 = _find_b(ref, a0, color)
            a1 = work[i] if i < len(work) else width
            if b2 < a1:
                bw.write(0b0001, 4)       # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                d = a1 - b1
                code, bits = {
                    0: (0b1, 1), 1: (0b011, 3), -1: (0b010, 3),
                    2: (0b000011, 6), -2: (0b000010, 6),
                    3: (0b0000011, 7), -3: (0b0000010, 7),
                }[d]
                bw.write(code, bits)      # vertical
                a0 = a1
                color ^= 1
                i += 1
            else:
                a2 = work[i + 1] if i + 1 < len(work) else width
                start = a0 if a0 > 0 else 0
                bw.write(0b001, 3)        # horizontal
                _write_run(bw, a1 - start, black=bool(color))
                _write_run(bw, a2 - a1, black=not bool(color))
                a0 = a2
                i += 2
        ref = cur + [width, width] if cur else [width, width]


def encode_g4_planes(
    planes: "List[bytes]", columns: int, rows: int, threshold: int = 128
) -> bytes:
    """Encode several equal-sized G4 images into ONE bitstream: the
    reference line resets to all-white between images and a single
    EOFB terminates the whole stream — the layout JBIG2's MMR-coded
    halftone GRAYSCALE uses (T.88 C.5 / §6.6.5.1: bitplanes share one
    MMR stream, EOFB only after the last plane)."""
    if columns <= 0 or rows <= 0:
        raise CcittError("bad plane dimensions")
    if not planes:
        raise CcittError("no planes")
    bw = _BitWriter()
    for luma in planes:
        if len(luma) < columns * rows:
            raise CcittError("short plane")
        _encode_g4_into(bw, luma, columns, rows, threshold)
    bw.write(0x001001, 24)                # EOFB
    return bw.done()


def decode_g4_planes(
    data: bytes, columns: int, rows: int, nplanes: int
) -> "List[bytes]":
    """Decode ``nplanes`` consecutive G4 images of (columns, rows) from
    one bitstream (reference reset to white between images, one
    trailing EOFB) → luma buffers (black=0, white=255).  Exact mirror
    of :func:`encode_g4_planes`."""
    if not 0 < columns <= MAX_COLUMNS or not 0 < rows <= MAX_ROWS:
        raise CcittError("bad plane dimensions")
    if nplanes <= 0 or nplanes * rows * columns > MAX_PIXELS:
        raise CcittError("bad plane count")
    br = _BitReader(data)
    planes: List[bytes] = []
    for _ in range(nplanes):
        ref = [columns, columns]
        out: List[bytes] = []
        for _y in range(rows):
            if br.exhausted():
                raise CcittError("truncated plane stream")
            cur = _decode_2d_line(br, ref, columns)
            out.append(_line_to_runs(cur, columns))
            ref = cur + [columns, columns]
        planes.append(b"".join(out))
    return planes

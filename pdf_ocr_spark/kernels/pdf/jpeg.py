"""From-scratch baseline JPEG (DCTDecode) codec — ISO/IEC 10918-1.

The reference renders real pixmaps and OCRs real pixels
(/root/reference/pdf_ocr_with_boxes_v2.py:200-209); our sandbox has no
image libraries, so until now DCTDecode streams flowed to the OCR
branch as opaque bytes (kernels/pdf/cos.py:138-141).  This module makes
the scan branch process ACTUAL image content:

* :func:`decode` — baseline sequential DCT decoder (SOF0/SOF1 Huffman,
  grayscale + YCbCr with 4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 sampling, DRI/RST
  restart intervals, 8- and 16-bit DQT, FF-stuffing).  Dequantization +
  IDCT are vectorized over all blocks with numpy; only the Huffman
  bit-walk is per-symbol python (bounded by the entropy stream length).
* :func:`encode_gray` — baseline sequential grayscale encoder with the
  Annex-K luminance quantization table (libjpeg quality scaling) and the
  Annex-K standard Huffman tables, so output decodes anywhere.

Everything is bounded and no-surprise: malformed/truncated input raises
:class:`JpegError` (never hangs, never over-allocates — dimensions are
capped), matching the kernel no-raise-at-callsite discipline: callers
catch JpegError and fall back to the opaque-bytes path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["JpegError", "decode", "decode_gray", "encode_gray", "is_jpeg"]


class JpegError(ValueError):
    """Malformed, truncated, or unsupported (progressive/arithmetic/
    12-bit) JPEG input."""


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
    __slots__ = ("cid", "h", "v", "tq", "dc_tbl", "ac_tbl", "blocks", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int) -> None:
        if not (1 <= h <= 4 and 1 <= v <= 4):
            raise JpegError("bad sampling factors")
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_tbl: Optional[dict] = None
        self.ac_tbl: Optional[dict] = None
        self.blocks: List[np.ndarray] = []   # zigzag int64[64] per block
        self.pred = 0


def decode(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → (width, height, n_components, pixels).

    pixels is row-major: luma bytes for 1 component, interleaved RGB for
    3 (JFIF YCbCr, BT.601 full-range).  Raises JpegError on anything
    malformed, truncated, progressive, arithmetic, or 12-bit."""
    if not is_jpeg(data):
        raise JpegError("no SOI")
    qtables: Dict[int, np.ndarray] = {}
    dc_tables: Dict[int, dict] = {}
    ac_tables: Dict[int, dict] = {}
    comps: List[_Component] = []
    w = h = 0
    restart_interval = 0
    pos = 2
    n = len(data)
    while True:
        if pos + 4 > n:
            raise JpegError("truncated before SOS")
        if data[pos] != 0xFF:
            raise JpegError("expected marker, got 0x%02X" % data[pos])
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:          # stray SOI
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                # standalone markers
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
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 — baseline sequential
            if len(body) < 6:
                raise JpegError("short SOF")
            if body[0] != 8:
                raise JpegError("only 8-bit precision supported")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            if not (1 <= w <= MAX_SIDE and 1 <= h <= MAX_SIDE):
                raise JpegError("dimensions out of bounds")
            if w * h > MAX_PIXELS:
                raise JpegError("pixel count out of bounds")
            if nc not in (1, 3):
                raise JpegError("only 1 or 3 components supported")
            if len(body) < 6 + 3 * nc:
                raise JpegError("short SOF component list")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline SOF 0x%02X unsupported" % marker)
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
        elif marker == 0xDA:        # SOS
            break
        elif marker == 0xD9:
            raise JpegError("EOI before SOS")
        else:
            continue                # APPn / COM / others: skipped
    if not comps or w == 0:
        raise JpegError("SOS before SOF")
    # SOS header
    ns = body[0]
    if ns != len(comps):
        raise JpegError("partial-scan (non-interleaved) JPEG unsupported")
    for si in range(ns):
        cs, tds = body[1 + 2 * si], body[2 + 2 * si]
        for c in comps:
            if c.cid == cs:
                c.dc_tbl = dc_tables.get(tds >> 4)
                c.ac_tbl = ac_tables.get(tds & 15)
                if c.dc_tbl is None or c.ac_tbl is None:
                    raise JpegError("scan references missing DHT")
    for c in comps:
        if c.tq not in qtables:
            raise JpegError("SOF references missing DQT")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(data, pos)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            for c in comps:
                c.pred = 0
        for c in comps:
            for _ in range(c.h * c.v):
                blk = np.zeros(64, dtype=np.int64)
                t = reader.decode_symbol(c.dc_tbl)
                if t > 11:
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
                c.blocks.append(blk)

    # dequantize + IDCT, vectorized per component over all blocks
    planes: List[np.ndarray] = []
    for c in comps:
        q = qtables[c.tq]
        zz = np.stack(c.blocks) * q[np.newaxis, :]        # (nblk, 64) zigzag
        rasters = np.zeros_like(zz)
        rasters[:, ZIGZAG] = zz                           # de-zigzag
        coeff = rasters.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ux,nuv,vy->nxy", _C, coeff, _C)
        pix = np.clip(np.round(spatial) + 128.0, 0, 255).astype(np.uint8)
        # assemble plane: blocks are in MCU order, c.h x c.v per MCU
        pw, ph = mcux * c.h * 8, mcuy * c.v * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c.v):
                    for bx in range(c.h):
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = pix[bi]
                        bi += 1
        # upsample to full resolution (nearest — JFIF-legal) and crop
        if c.h != hmax or c.v != vmax:
            plane = plane.repeat(vmax // c.v, axis=0).repeat(hmax // c.h, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return w, h, 1, planes[0].tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = np.clip(np.round(y + 1.402 * cr), 0, 255)
    g = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.round(y + 1.772 * cb), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


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


def encode_gray(pixels: bytes, width: int, height: int, quality: int = 90) -> bytes:
    """Encode a row-major 8-bit grayscale image as baseline JPEG.

    Standard tables (Annex K) + quality-scaled luminance DQT; output is
    a plain JFIF file any decoder accepts.  Deterministic: same input →
    same bytes (fixture generation depends on this)."""
    if width <= 0 or height <= 0 or width > MAX_SIDE or height > MAX_SIDE:
        raise JpegError("bad encode dimensions")
    if len(pixels) != width * height:
        raise JpegError("pixel buffer size mismatch")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    pw, ph = -(-width // 8) * 8, -(-height // 8) * 8
    padded = np.empty((ph, pw), dtype=np.uint8)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]           # edge replication
    padded[:, width:] = padded[:, width - 1 : width]
    q = _scaled_qtable(quality)                      # raster order (Annex K)

    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeff = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    quant = np.round(coeff.reshape(-1, 64) / q[np.newaxis, :]).astype(np.int64)
    zz = quant[:, ZIGZAG]                            # raster → zigzag scan order

    dc_codes = _build_codes(*STD_DC_LUMA)
    ac_codes = _build_codes(*STD_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for blk in zz:
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
                    code, ln = ac_codes[0xF0]        # ZRL
                    bw.put(code, ln)
                    run = 0
                continue
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]                # EOB
            bw.put(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")                     # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q[ZIGZAG]))  # DQT is zigzag-ordered
    out += seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    db, dv = STD_DC_LUMA
    out += seg(0xC4, bytes([0x00]) + bytes(db) + bytes(dv))
    ab, av = STD_AC_LUMA
    out += seg(0xC4, bytes([0x10]) + bytes(ab) + bytes(av))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)

"""From-scratch JPEG 2000 codec (the PDF ``JPXDecode`` filter).

The reference OCRs real pixmaps rendered from whatever codec the PDF
carries (/root/reference/pdf_ocr_with_boxes_v2.py:200-247 via fitz);
this sandbox has no image libraries, so the scan branch gets a pure
python implementation of the third — and last — real-world scan codec
after DCTDecode (jpeg.py) and CCITTFaxDecode (ccitt.py).  Everything
here is implemented from the public ITU-T T.800 / ISO 15444-1 spec
(MQ coder tables from ITU-T T.88): no library, no reference code.

Scope — the profile real scanned-PDF JPX streams overwhelmingly use,
restricted to what the sandbox needs end-to-end and implemented on BOTH
sides so fixtures can be generated deterministically:

* single component (grayscale), 8-bit unsigned, no subsampling
* single tile at origin, single quality layer, LRCP progression
* reversible 5/3 integer wavelet (lossless), no quantization
* EBCOT: MQ arithmetic coding (T.88 software conventions), all three
  coding passes (significance propagation / magnitude refinement /
  cleanup with run mode), default code-block style (no bypass, no
  termination per pass, no vertically-causal contexts)
* tag-tree coded packet headers (inclusion + zero-bitplanes), Lblock
  length signalling, bit-stuffed header writer
* raw codestream (SOC..EOC) and JP2 box container (signature/ftyp/
  jp2h/jp2c) — PDF embeds either

Encoder and decoder are exact mirrors; correctness is pinned by
lossless round-trip tests (encode→decode == input, bit-exact), frozen
pipeline goldens, and truncation fuzz (decode must raise ``JP2Error``,
never crash or loop).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


class JP2Error(ValueError):
    """Malformed / truncated / unsupported JPEG 2000 data."""


# --------------------------------------------------------------------------
# MQ arithmetic coder — ITU-T T.88 (also T.800 Annex C), software conventions
# --------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH) — the 47-state probability estimation table
_MQ_TABLE: Tuple[Tuple[int, int, int, int], ...] = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# EBCOT context numbering (T.800 Annex D): 0-8 zero coding, 9-13 sign
# coding, 14-16 magnitude refinement, 17 run-length, 18 uniform.
N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18


def _initial_ctx_states() -> List[List[int]]:
    """Per-context [state_index, mps] at codeblock start (T.800 D.2)."""
    states = [[0, 0] for _ in range(N_CTX)]
    states[0] = [4, 0]          # ZC all-insignificant context
    states[_CTX_RL] = [3, 0]
    states[_CTX_UNI] = [46, 0]
    return states


class MQEncoder:
    """T.88 MQ encoder (software-convention flowcharts C.2).

    ``states`` swaps in a different context table (any mapping of
    context id → [state_index, mps]); the default is the EBCOT table.
    The JBIG2 kernel (kernels/pdf/jbig2.py) reuses this coder with a
    lazily-allocated 2^16-context table, per that spec's shared Annex.
    """

    def __init__(self, states=None) -> None:
        self.ctx = _initial_ctx_states() if states is None else states
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = -1            # index of the byte BP points at (-1 = none)
        self.out = bytearray()

    def encode(self, d: int, cx: int) -> None:
        state = self.ctx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[state[0]]
        if d == state[1]:      # MPS path
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            state[0] = nmps
        else:                  # LPS path
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                state[1] ^= 1
            state[0] = nlps
        # RENORME
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break
        self.a &= 0xFFFF

    def _byteout(self) -> None:
        if self.b >= 0 and self.out[self.b] == 0xFF:
            # stuffing: 7 data bits follow an 0xFF — PLUS the carry bit
            # riding in C's bit 27 (that is why CT is 7 here), so the
            # byte is C>>20 un-truncated (always ≤ 0x8F by the coder
            # invariant; > 0x8F would be a marker)
            self.out.append((self.c >> 20) & 0xFF)
            self.b = len(self.out) - 1
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.b = len(self.out) - 1
            self.c &= 0x7FFFF
            self.ct = 8
            return
        # carry into B
        if self.b >= 0:
            self.out[self.b] += 1
            if self.out[self.b] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0x7F)
                self.b = len(self.out) - 1
                self.c &= 0xFFFFF
                self.ct = 7
                return
        self.out.append((self.c >> 19) & 0xFF)
        self.b = len(self.out) - 1
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        """FLUSH (T.88 C.2.9): set as many 1-bits in C as possible,
        then push the final bytes out; drop a trailing 0xFF."""
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        data = bytes(self.out)
        if data.endswith(b"\xff"):
            data = data[:-1]
        # the first emitted byte is a spacer produced before any real
        # output only when b started at -1 and the first byteout ran the
        # c<0x8000000 path — T.88's convention already accounts for it;
        # nothing to strip here.
        return data


class MQDecoder:
    """T.88 MQ decoder (software-convention flowcharts C.3).

    ``states`` as in :class:`MQEncoder`.
    """

    def __init__(self, data: bytes, states=None) -> None:
        self.ctx = _initial_ctx_states() if states is None else states
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _cur(self) -> int:
        return self.data[self.bp] if self.bp < len(self.data) else 0xFF

    def _next(self) -> int:
        return self.data[self.bp + 1] if self.bp + 1 < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._cur() == 0xFF:
            if self._next() > 0x8F:
                self.c += 0xFF00       # marker found: feed 1-bits forever
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._cur() << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._cur() << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        state = self.ctx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[state[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = state[1]
                state[0] = nmps
            else:
                d = 1 - state[1]
                if switch:
                    state[1] ^= 1
                state[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return state[1]
            if self.a < qe:
                d = 1 - state[1]
                if switch:
                    state[1] ^= 1
                state[0] = nlps
            else:
                d = state[1]
                state[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        self.a &= 0xFFFF
        return d


# --------------------------------------------------------------------------
# EBCOT context formation (T.800 Annex D)
# --------------------------------------------------------------------------

_SB_LL, _SB_HL, _SB_LH, _SB_HH = 0, 1, 2, 3


def _build_zc_lut() -> List[List[int]]:
    """ZC context per orientation indexed [orient][h*15 + v*5 + d]
    (h, v ∈ 0..2, d ∈ 0..4) — Tables D.1 of T.800."""
    luts = []
    for orient in range(4):
        lut = [0] * 45
        for h in range(3):
            for v in range(3):
                for d in range(5):
                    if orient == _SB_HH:
                        if d >= 3:
                            cx = 8
                        elif d == 2:
                            cx = 7 if h + v >= 1 else 6
                        elif d == 1:
                            cx = 5 if h + v >= 2 else (4 if h + v == 1 else 3)
                        else:
                            cx = 2 if h + v >= 2 else (1 if h + v == 1 else 0)
                    else:
                        hh, vv = (v, h) if orient == _SB_HL else (h, v)
                        if hh == 2:
                            cx = 8
                        elif hh == 1:
                            cx = 7 if vv >= 1 else (6 if d >= 1 else 5)
                        elif vv == 2:
                            cx = 4
                        elif vv == 1:
                            cx = 3
                        else:
                            cx = 2 if d >= 2 else (1 if d == 1 else 0)
                    lut[h * 15 + v * 5 + d] = cx
        luts.append(lut)
    return luts


_ZC_LUT = _build_zc_lut()

# sign-coding (ctx, xor) by (χH+1, χV+1) — Table D.3
_SC_TABLE = (
    ((13, 1), (12, 1), (11, 1)),   # χH = -1 : χV = -1, 0, 1
    ((10, 1), (9, 0), (10, 0)),    # χH =  0
    ((11, 0), (12, 0), (13, 0)),   # χH = +1
)


class _BlockCoder:
    """Shared encoder/decoder state machine for one codeblock's EBCOT
    Tier-1 pass structure.  The significance scan, pass membership, run
    mode, and context formation are identical on both sides; only the
    primitive bit operation differs (MQ encode vs decode), so each pass
    is written once and parameterized by ``self._bit`` / ``self._sign``.
    """

    def __init__(self, w: int, h: int, orient: int) -> None:
        self.w = w
        self.h = h
        self.zc = _ZC_LUT[orient]
        n = w * h
        self.sig = bytearray(n)
        self.vis = bytearray(n)
        self.ref = bytearray(n)
        self.sgn = bytearray(n)    # 0 = positive, 1 = negative
        self.mag = [0] * n

    # -- context helpers ----------------------------------------------------

    def _zc_ctx(self, x: int, y: int) -> int:
        w, h, sig = self.w, self.h, self.sig
        i = y * w + x
        hn = 0
        if x > 0 and sig[i - 1]:
            hn += 1
        if x + 1 < w and sig[i + 1]:
            hn += 1
        vn = 0
        if y > 0 and sig[i - w]:
            vn += 1
        if y + 1 < h and sig[i + w]:
            vn += 1
        dn = 0
        if x > 0 and y > 0 and sig[i - w - 1]:
            dn += 1
        if x + 1 < w and y > 0 and sig[i - w + 1]:
            dn += 1
        if x > 0 and y + 1 < h and sig[i + w - 1]:
            dn += 1
        if x + 1 < w and y + 1 < h and sig[i + w + 1]:
            dn += 1
        return self.zc[hn * 15 + vn * 5 + dn]

    def _sc_ctx(self, x: int, y: int) -> Tuple[int, int]:
        w, h, sig, sgn = self.w, self.h, self.sig, self.sgn
        i = y * w + x
        hc = 0
        if x > 0 and sig[i - 1]:
            hc += -1 if sgn[i - 1] else 1
        if x + 1 < w and sig[i + 1]:
            hc += -1 if sgn[i + 1] else 1
        hc = max(-1, min(1, hc))
        vc = 0
        if y > 0 and sig[i - w]:
            vc += -1 if sgn[i - w] else 1
        if y + 1 < h and sig[i + w]:
            vc += -1 if sgn[i + w] else 1
        vc = max(-1, min(1, vc))
        return _SC_TABLE[hc + 1][vc + 1]

    def _mr_ctx(self, x: int, y: int) -> int:
        if self.ref[y * self.w + x]:
            return 16
        # ZC context 0 ⇔ no significant neighbour (in every orientation
        # the tables map exactly the (0,0,0) cell to 0)
        return 15 if self._zc_ctx(x, y) != 0 else 14

    def _any_sig(self, x: int, y: int) -> bool:
        w, h, sig = self.w, self.h, self.sig
        for dy in (-1, 0, 1):
            yy = y + dy
            if yy < 0 or yy >= h:
                continue
            base = yy * w
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                xx = x + dx
                if 0 <= xx < w and sig[base + xx]:
                    return True
        return False

    # -- the three passes (encoder/decoder shared skeleton) ------------------

    def _sig_prop_pass(self, p: int) -> None:
        w, h = self.w, self.h
        sig, vis = self.sig, self.vis
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            for x in range(w):
                for y in range(y0, y1):
                    i = y * w + x
                    if sig[i]:
                        continue
                    cx = self._zc_ctx(x, y)
                    if cx == 0:
                        # pass membership requires a significant
                        # neighbour, and ZC context 0 ⇔ none
                        continue
                    if self._bit_sig(i, x, y, p, cx):
                        sig[i] = 1
                        self._code_sign(i, x, y)
                    vis[i] = 1

    def _mag_ref_pass(self, p: int) -> None:
        w, h = self.w, self.h
        sig, vis, ref = self.sig, self.vis, self.ref
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            for x in range(w):
                for y in range(y0, y1):
                    i = y * w + x
                    if not sig[i] or vis[i]:
                        continue
                    self._bit_ref(i, x, y, p, self._mr_ctx(x, y))
                    ref[i] = 1
                    vis[i] = 1

    def _cleanup_pass(self, p: int) -> None:
        w, h = self.w, self.h
        sig, vis = self.sig, self.vis
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            full = y1 - y0 == 4
            for x in range(w):
                y = y0
                if full:
                    run_ok = True
                    for yy in range(y0, y1):
                        i = yy * w + x
                        if sig[i] or vis[i] or self._any_sig(x, yy):
                            run_ok = False
                            break
                    if run_ok:
                        k = self._run_mode(x, y0, p)
                        if k < 0:        # all four stay insignificant
                            continue
                        i = (y0 + k) * w + x
                        sig[i] = 1
                        self._code_sign(i, x, y0 + k)
                        y = y0 + k + 1
                for yy in range(y, y1):
                    i = yy * w + x
                    if vis[i] or sig[i]:
                        continue
                    if self._bit_sig(i, x, yy, p, self._zc_ctx(x, yy)):
                        sig[i] = 1
                        self._code_sign(i, x, yy)

    def _reset_vis(self) -> None:
        for i in range(len(self.vis)):
            self.vis[i] = 0


class _BlockEncoder(_BlockCoder):
    def __init__(self, coefs: List[int], w: int, h: int, orient: int) -> None:
        super().__init__(w, h, orient)
        for i, v in enumerate(coefs):
            if v < 0:
                self.sgn[i] = 1
                self.mag[i] = -v
            else:
                self.mag[i] = v
        self.mq = MQEncoder()

    def _bit_sig(self, i: int, x: int, y: int, p: int, cx: int) -> int:
        bit = (self.mag[i] >> p) & 1
        self.mq.encode(bit, cx)
        return bit

    def _bit_ref(self, i: int, x: int, y: int, p: int, cx: int) -> int:
        bit = (self.mag[i] >> p) & 1
        self.mq.encode(bit, cx)
        return bit

    def _code_sign(self, i: int, x: int, y: int) -> None:
        cx, xor = self._sc_ctx(x, y)
        self.mq.encode(self.sgn[i] ^ xor, cx)

    def _run_mode(self, x: int, y0: int, p: int) -> int:
        w = self.w
        k = -1
        for kk in range(4):
            if (self.mag[(y0 + kk) * w + x] >> p) & 1:
                k = kk
                break
        if k < 0:
            self.mq.encode(0, _CTX_RL)
            return -1
        self.mq.encode(1, _CTX_RL)
        self.mq.encode((k >> 1) & 1, _CTX_UNI)
        self.mq.encode(k & 1, _CTX_UNI)
        return k

    def run(self) -> Tuple[bytes, int, int]:
        """Code all bitplanes → (mq bytes, n_bitplanes, n_passes)."""
        maxmag = max(self.mag) if self.mag else 0
        nbp = maxmag.bit_length()
        if nbp == 0:
            return b"", 0, 0
        for p in range(nbp - 1, -1, -1):
            if p != nbp - 1:
                self._sig_prop_pass(p)
                self._mag_ref_pass(p)
            self._cleanup_pass(p)
            self._reset_vis()
        return self.mq.flush(), nbp, 3 * nbp - 2


class _BlockDecoder(_BlockCoder):
    def __init__(self, data: bytes, w: int, h: int, orient: int,
                 nbp: int) -> None:
        super().__init__(w, h, orient)
        self.mq = MQDecoder(data)
        self.nbp = nbp

    def _bit_sig(self, i: int, x: int, y: int, p: int, cx: int) -> int:
        bit = self.mq.decode(cx)
        if bit:
            self.mag[i] |= 1 << p
        return bit

    def _bit_ref(self, i: int, x: int, y: int, p: int, cx: int) -> int:
        bit = self.mq.decode(cx)
        if bit:
            self.mag[i] |= 1 << p
        return bit

    def _code_sign(self, i: int, x: int, y: int) -> None:
        cx, xor = self._sc_ctx(x, y)
        self.sgn[i] = self.mq.decode(cx) ^ xor

    def _run_mode(self, x: int, y0: int, p: int) -> int:
        if not self.mq.decode(_CTX_RL):
            return -1
        k = (self.mq.decode(_CTX_UNI) << 1) | self.mq.decode(_CTX_UNI)
        self.mag[(y0 + k) * self.w + x] |= 1 << p
        return k

    def run(self) -> List[int]:
        """Decode all bitplanes → signed coefficients."""
        nbp = self.nbp
        for p in range(nbp - 1, -1, -1):
            if p != nbp - 1:
                self._sig_prop_pass(p)
                self._mag_ref_pass(p)
            self._cleanup_pass(p)
            self._reset_vis()
        return [
            -m if s else m for m, s in zip(self.mag, self.sgn)
        ]


# --------------------------------------------------------------------------
# Tag trees (T.800 B.10.2) and bit-stuffed packet-header IO (B.10.1)
# --------------------------------------------------------------------------

_TT_UNKNOWN = 1 << 30


class _TagTree:
    """2D tag tree: per-node running lower bound (shared encoder/decoder
    knowledge) + value (encoder: set from leaves; decoder: discovered)."""

    def __init__(self, nx: int, ny: int) -> None:
        if nx <= 0 or ny <= 0:
            raise JP2Error("empty tag tree")
        self.dims: List[Tuple[int, int]] = []
        w, h = nx, ny
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        # per level: flat arrays of value / low / known
        self.value = [[_TT_UNKNOWN] * (w * h) for (w, h) in self.dims]
        self.low = [[0] * (w * h) for (w, h) in self.dims]
        self.known = [[False] * (w * h) for (w, h) in self.dims]

    def set_leaves(self, values: Sequence[int]) -> None:
        """Encoder side: leaf values, internal nodes = min of children."""
        nx, ny = self.dims[0]
        if len(values) != nx * ny:
            raise JP2Error("tag tree leaf count mismatch")
        self.value[0] = list(values)
        for lv in range(1, len(self.dims)):
            wc, hc = self.dims[lv - 1]
            wp, hp = self.dims[lv]
            up = [_TT_UNKNOWN] * (wp * hp)
            for y in range(hc):
                for x in range(wc):
                    pi = (y // 2) * wp + (x // 2)
                    v = self.value[lv - 1][y * wc + x]
                    if v < up[pi]:
                        up[pi] = v
            self.value[lv] = up

    def _path(self, x: int, y: int) -> List[Tuple[int, int]]:
        """(level, index) from root down to the leaf."""
        out = []
        for lv, (w, _h) in enumerate(self.dims):
            out.append((lv, (y >> lv) * w + (x >> lv)))
        return list(reversed(out))

    def encode(self, bw: "_HdrWriter", x: int, y: int, threshold: int) -> None:
        low = 0
        for lv, i in self._path(x, y):
            if low > self.low[lv][i]:
                self.low[lv][i] = low
            else:
                low = self.low[lv][i]
            while low < threshold:
                if low >= self.value[lv][i]:
                    if not self.known[lv][i]:
                        bw.put(1)
                        self.known[lv][i] = True
                    break
                bw.put(0)
                low += 1
            self.low[lv][i] = low

    def decode(self, br: "_HdrReader", x: int, y: int, threshold: int) -> bool:
        """Consume bits; True iff the leaf's value is known < threshold."""
        low = 0
        for lv, i in self._path(x, y):
            if low > self.low[lv][i]:
                self.low[lv][i] = low
            else:
                low = self.low[lv][i]
            while low < threshold:
                if low >= self.value[lv][i]:
                    break
                if br.get():
                    self.value[lv][i] = low
                else:
                    low += 1
            self.low[lv][i] = low
        return self.value[0][(y * self.dims[0][0]) + x] < threshold


class _HdrWriter:
    """MSB-first bit writer with 0xFF stuffing: a byte following 0xFF
    carries only 7 bits (T.800 B.10.1)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def _limit(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def put(self, bit: int) -> None:
        self.buf = (self.buf << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self._limit():
            self.out.append(self.buf)
            self.buf = 0
            self.nbits = 0

    def put_bits(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put((v >> k) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf << (self._limit() - self.nbits))
            self.buf = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)   # a header must not end in 0xFF
        return bytes(self.out)


class _HdrReader:
    """Mirror of _HdrWriter over a memoryview; tracks bytes consumed."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.last_byte = -1

    def _load(self) -> None:
        if self.pos >= len(self.data):
            raise JP2Error("truncated packet header")
        b = self.data[self.pos]
        self.pos += 1
        if self.last_byte == 0xFF:
            if b > 0x8F:
                raise JP2Error("marker inside packet header")
            self.buf = b
            self.nbits = 7
        else:
            self.buf = b
            self.nbits = 8
        self.last_byte = b

    def get(self) -> int:
        if self.nbits == 0:
            self._load()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """End of packet header: discard partial byte; a trailing 0xFF
        is followed by a stuffed byte that belongs to the header."""
        self.buf = 0
        self.nbits = 0
        if self.last_byte == 0xFF:
            if self.pos >= len(self.data):
                raise JP2Error("truncated packet header")
            self.pos += 1
        self.last_byte = -1
        return self.pos


# --------------------------------------------------------------------------
# Reversible 5/3 DWT (T.800 Annex F) — vectorized lifting with
# whole-sample symmetric extension
# --------------------------------------------------------------------------

import numpy as _np


def _mirror(idx: "_np.ndarray", n: int) -> "_np.ndarray":
    if n == 1:
        return _np.zeros_like(idx)
    period = 2 * n - 2
    m = _np.abs(idx) % period
    return _np.where(m >= n, period - m, m)


def _fwd53_last_axis(a: "_np.ndarray") -> Tuple["_np.ndarray", "_np.ndarray"]:
    """One 5/3 analysis step along the last axis → (low, high)."""
    n = a.shape[-1]
    if n == 1:
        return a.copy(), a[..., :0]
    odd = _np.arange(1, n, 2)
    even = _np.arange(0, n, 2)
    # predict: d[i] = x[2i+1] - floor((x[2i] + x[2i+2]) / 2)
    left = a[..., _mirror(odd - 1, n)]
    right = a[..., _mirror(odd + 1, n)]
    d = a[..., odd] - ((left + right) >> 1)
    # update: s[i] = x[2i] + floor((d(2i-1) + d(2i+1) + 2) / 4) where the
    # d neighbours come from the mirrored interleaved signal (odd slots)
    dl = d[..., (_mirror(even - 1, n) - 1) >> 1]
    dr = d[..., (_mirror(even + 1, n) - 1) >> 1]
    s = a[..., even] + ((dl + dr + 2) >> 2)
    return s, d


def _inv53_last_axis(s: "_np.ndarray", d: "_np.ndarray") -> "_np.ndarray":
    """One 5/3 synthesis step along the last axis."""
    nl = s.shape[-1]
    nh = d.shape[-1]
    n = nl + nh
    if n == 1:
        return s.copy()
    even = _np.arange(0, n, 2)
    odd = _np.arange(1, n, 2)
    dl = d[..., (_mirror(even - 1, n) - 1) >> 1]
    dr = d[..., (_mirror(even + 1, n) - 1) >> 1]
    x_even = s - ((dl + dr + 2) >> 2)
    xl = x_even[..., _mirror(odd - 1, n) >> 1]
    xr = x_even[..., _mirror(odd + 1, n) >> 1]
    x_odd = d + ((xl + xr) >> 1)
    out = _np.empty(s.shape[:-1] + (n,), dtype=s.dtype)
    out[..., even] = x_even
    out[..., odd] = x_odd
    return out


def _fwd53_2d(a: "_np.ndarray") -> Tuple["_np.ndarray", "_np.ndarray",
                                         "_np.ndarray", "_np.ndarray"]:
    """(LL, HL, LH, HH); rows (x) first, then columns (y)."""
    lo, hi = _fwd53_last_axis(a)
    llo = _np.swapaxes(lo, -1, -2)
    lhi = _np.swapaxes(hi, -1, -2)
    ll, lh = _fwd53_last_axis(llo)
    hl, hh = _fwd53_last_axis(lhi)
    return (_np.swapaxes(ll, -1, -2), _np.swapaxes(hl, -1, -2),
            _np.swapaxes(lh, -1, -2), _np.swapaxes(hh, -1, -2))


def _inv53_2d(ll: "_np.ndarray", hl: "_np.ndarray",
              lh: "_np.ndarray", hh: "_np.ndarray") -> "_np.ndarray":
    lo = _inv53_last_axis(_np.swapaxes(ll, -1, -2), _np.swapaxes(lh, -1, -2))
    hi = _inv53_last_axis(_np.swapaxes(hl, -1, -2), _np.swapaxes(hh, -1, -2))
    return _inv53_last_axis(_np.swapaxes(lo, -1, -2), _np.swapaxes(hi, -1, -2))


# --------------------------------------------------------------------------
# Codestream assembly / parsing (T.800 Annex A, B.9-B.10) and JP2 boxes
# --------------------------------------------------------------------------

_GUARD_BITS = 2
_MARK_SOC = 0xFF4F
_MARK_SIZ = 0xFF51
_MARK_COD = 0xFF52
_MARK_QCD = 0xFF5C
_MARK_SOT = 0xFF90
_MARK_SOD = 0xFF93
_MARK_EOC = 0xFFD9


def _u16(v: int) -> bytes:
    return v.to_bytes(2, "big")


def _u32(v: int) -> bytes:
    return v.to_bytes(4, "big")


def _band_dims(width: int, height: int, levels: int
               ) -> List[List[Tuple[int, int, int]]]:
    """Per-resolution subband layout [(orient, bw, bh), ...] — r=0 is the
    final LL, r=k holds the detail bands of decomposition level
    ``levels - k + 1`` (coarsest detail first), mirroring LRCP packets."""
    dims = [(width, height)]
    w, h = width, height
    for _ in range(levels):
        w, h = (w + 1) // 2, (h + 1) // 2
        dims.append((w, h))
    res = [[(_SB_LL, dims[levels][0], dims[levels][1])]]
    for r in range(1, levels + 1):
        wp, hp = dims[levels - r]           # parent LL dims at this level
        wl, hl = (wp + 1) // 2, (hp + 1) // 2
        wh, hh = wp - wl, hp - hl
        res.append([(_SB_HL, wh, hl), (_SB_LH, wl, hh), (_SB_HH, wh, hh)])
    return res


def _code_npasses(bw: _HdrWriter, n: int) -> None:
    """Number-of-coding-passes code (T.800 Table B.4)."""
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put(1)
        bw.put(0)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    elif n <= 164:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)
    else:
        raise JP2Error(f"too many coding passes: {n}")


def _read_npasses(br: _HdrReader) -> int:
    if not br.get():
        return 1
    if not br.get():
        return 2
    v = br.get_bits(2)
    if v < 3:
        return 3 + v
    v = br.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.get_bits(7)


def _encode_packet(res_bands: Sequence[Tuple[int, "_np.ndarray"]],
                   cb_w: int, cb_h: int) -> Tuple[bytes, List[int]]:
    """One LRCP packet (single layer/precinct) → (bytes, subband Mb's)."""
    bw = _HdrWriter()
    bw.put(1)                       # packet non-empty
    bodies: List[bytes] = []
    mbs: List[int] = []
    for orient, band in res_bands:
        bh, bwid = band.shape
        if bh == 0 or bwid == 0:
            mbs.append(1)
            continue
        ncx = -(-bwid // cb_w)
        ncy = -(-bh // cb_h)
        blocks = []
        for cy in range(ncy):
            for cx in range(ncx):
                sub = band[cy * cb_h:(cy + 1) * cb_h,
                           cx * cb_w:(cx + 1) * cb_w]
                sh, sw = sub.shape
                enc = _BlockEncoder(
                    [int(v) for v in sub.ravel()], sw, sh, orient)
                data, nbp, npasses = enc.run()
                blocks.append((data, nbp, npasses))
        mb = max(1, max((b[1] for b in blocks), default=0))
        mbs.append(mb)
        incl = _TagTree(ncx, ncy)
        imsb = _TagTree(ncx, ncy)
        incl.set_leaves([0 if b[1] else 1 for b in blocks])
        imsb.set_leaves([mb - b[1] for b in blocks])
        for cy in range(ncy):
            for cx in range(ncx):
                data, nbp, npasses = blocks[cy * ncx + cx]
                incl.encode(bw, cx, cy, 1)
                if not nbp:
                    continue
                imsb.encode(bw, cx, cy, mb - nbp + 1)
                _code_npasses(bw, npasses)
                lblock = 3
                nbits = lblock + max(0, npasses.bit_length() - 1)
                inc = max(0, len(data).bit_length() - nbits)
                for _ in range(inc):
                    bw.put(1)
                bw.put(0)
                bw.put_bits(len(data), nbits + inc)
                bodies.append(data)
    return bw.flush() + b"".join(bodies), mbs


def _decode_packet(tile: bytes, pos: int, res_layout,
                   mbs_iter, cb_w: int, cb_h: int):
    """Parse one packet → (new_pos, [(orient, bw, bh, coefs), ...])."""
    br = _HdrReader(tile, pos)
    bands_out = []
    if not br.get():                # empty packet
        body_pos = br.align()
        for orient, bwid, bh in res_layout:
            next(mbs_iter, None)
            bands_out.append((orient, bwid, bh, None))
        return body_pos, bands_out
    # first walk reads the header; bodies are attached in a second walk,
    # filling bands_out IN LAYOUT ORDER (empty bands keep their slot)
    pending = []                    # (orient, bw, bh, ncx, ncy, slots)
    for orient, bwid, bh in res_layout:
        bands_out.append((orient, bwid, bh, None))
        if bh == 0 or bwid == 0:
            next(mbs_iter, None)
            continue
        mb = next(mbs_iter, None)
        if mb is None:
            raise JP2Error("QCD has fewer subbands than the COD layout")
        ncx = -(-bwid // cb_w)
        ncy = -(-bh // cb_h)
        incl = _TagTree(ncx, ncy)
        imsb = _TagTree(ncx, ncy)
        slots = []
        for cy in range(ncy):
            for cx in range(ncx):
                sw = min(cb_w, bwid - cx * cb_w)
                sh = min(cb_h, bh - cy * cb_h)
                if not incl.decode(br, cx, cy, 1):
                    slots.append(None)
                    continue
                t = 1
                while not imsb.decode(br, cx, cy, t):
                    t += 1
                    if t > 64:
                        raise JP2Error("runaway zero-bitplane tag tree")
                missing = t - 1
                nbp = mb - missing
                if nbp <= 0 or nbp > 31:
                    raise JP2Error(f"invalid bitplane count {nbp}")
                npasses = _read_npasses(br)
                if npasses != 3 * nbp - 2:
                    raise JP2Error("pass count does not match bitplanes")
                lblock = 3
                nbits = lblock + max(0, npasses.bit_length() - 1)
                inc = 0
                while br.get():
                    inc += 1
                    if inc > 32:
                        raise JP2Error("runaway Lblock signalling")
                length = br.get_bits(nbits + inc)
                slots.append((sw, sh, length, nbp))
        pending.append((len(bands_out) - 1, orient, bwid, bh, ncx, ncy, slots))
    pos = br.align()
    for out_idx, orient, bwid, bh, ncx, ncy, slots in pending:
        coefs = _np.zeros((bh, bwid), dtype=_np.int64)
        for cy in range(ncy):
            for cx in range(ncx):
                slot = slots[cy * ncx + cx]
                if slot is None:
                    continue
                sw, sh, length, nbp = slot
                if pos + length > len(tile):
                    raise JP2Error("truncated codeblock body")
                body = tile[pos:pos + length]
                pos += length
                dec = _BlockDecoder(body, sw, sh, orient, nbp)
                vals = dec.run()
                block = _np.array(vals, dtype=_np.int64).reshape(sh, sw)
                coefs[cy * cb_h:cy * cb_h + sh,
                      cx * cb_w:cx * cb_w + sw] = block
        bands_out[out_idx] = (orient, bwid, bh, coefs)
    return pos, bands_out


def encode_gray(width: int, height: int, pixels: bytes, levels: int = 2,
                cb_w: int = 32, cb_h: int = 32, jp2_wrap: bool = True
                ) -> bytes:
    """Lossless JPEG 2000 encode of an 8-bit grayscale image."""
    if width <= 0 or height <= 0 or len(pixels) != width * height:
        raise JP2Error("bad image dimensions")
    if not (0 <= levels <= 8):
        raise JP2Error("unsupported decomposition levels")
    for c in (cb_w, cb_h):
        if c & (c - 1) or not 4 <= c <= 1024:
            raise JP2Error("codeblock dims must be powers of two in 4..1024")
    if cb_w * cb_h > 4096:
        raise JP2Error("codeblock area exceeds 4096")
    a = _np.frombuffer(bytes(pixels), dtype=_np.uint8).astype(
        _np.int64).reshape(height, width) - 128
    ll = a
    detail = []
    for _ in range(levels):
        ll, hl, lh, hh = _fwd53_2d(ll)
        detail.append((hl, lh, hh))
    resolutions: List[List[Tuple[int, "_np.ndarray"]]] = [[(_SB_LL, ll)]]
    for r in range(1, levels + 1):
        hl, lh, hh = detail[levels - r]
        resolutions.append([(_SB_HL, hl), (_SB_LH, lh), (_SB_HH, hh)])
    packets = []
    all_mbs: List[int] = []
    for res in resolutions:
        pkt, mbs = _encode_packet(res, cb_w, cb_h)
        packets.append(pkt)
        all_mbs.extend(mbs)
    tile = b"".join(packets)
    siz = (_u16(0) + _u32(width) + _u32(height) + _u32(0) + _u32(0) +
           _u32(width) + _u32(height) + _u32(0) + _u32(0) + _u16(1) +
           bytes([7, 1, 1]))
    siz = _u16(_MARK_SIZ) + _u16(2 + len(siz)) + siz
    cod = (bytes([0]) +                       # Scod: default precincts
           bytes([0]) + _u16(1) + bytes([0]) +  # SGcod: LRCP, 1 layer, no MCT
           bytes([levels,
                  (cb_w.bit_length() - 3), (cb_h.bit_length() - 3),
                  0, 1]))                     # cb style 0, 5/3 transform
    cod = _u16(_MARK_COD) + _u16(2 + len(cod)) + cod
    qcd = bytes([(_GUARD_BITS << 5) | 0]) + bytes(
        max(0, min(31, mb - _GUARD_BITS + 1)) << 3 for mb in all_mbs)
    qcd = _u16(_MARK_QCD) + _u16(2 + len(qcd)) + qcd
    sot = (_u16(_MARK_SOT) + _u16(10) + _u16(0) +
           _u32(12 + 2 + len(tile)) + bytes([0, 1]))
    stream = (_u16(_MARK_SOC) + siz + cod + qcd + sot +
              _u16(_MARK_SOD) + tile + _u16(_MARK_EOC))
    if not jp2_wrap:
        return stream
    return _jp2_wrap(width, height, stream)


def _jp2_box(btype: bytes, payload: bytes) -> bytes:
    return _u32(8 + len(payload)) + btype + payload


_JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


def _jp2_wrap(width: int, height: int, codestream: bytes) -> bytes:
    ihdr = _jp2_box(b"ihdr", _u32(height) + _u32(width) + _u16(1) +
                    bytes([7, 7, 0, 0]))
    colr = _jp2_box(b"colr", bytes([1, 0, 0]) + _u32(17))  # greyscale
    return (_JP2_SIG +
            _jp2_box(b"ftyp", b"jp2 " + _u32(0) + b"jp2 ") +
            _jp2_box(b"jp2h", ihdr + colr) +
            _jp2_box(b"jp2c", codestream))


def is_jpx(data: bytes) -> bool:
    """True for a raw JPEG 2000 codestream or a JP2/JPX container."""
    return data[:4] == b"\xff\x4f\xff\x51" or data[:12] == _JP2_SIG


def _find_codestream(data: bytes) -> bytes:
    if data[:4] == b"\xff\x4f\xff\x51":
        return data
    if data[:12] != _JP2_SIG:
        raise JP2Error("neither a JP2 container nor a raw codestream")
    pos = 12
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if length == 1:
            if pos + 16 > len(data):
                raise JP2Error("truncated extended box")
            length = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif length == 0:
            length = len(data) - pos
        if length < hdr:
            raise JP2Error("corrupt box length")
        if btype == b"jp2c":
            return data[pos + hdr:pos + length]
        pos += length
    raise JP2Error("no contiguous-codestream box")


def decode_gray(data: bytes) -> Tuple[int, int, bytes]:
    """Decode a (restricted-profile) JPEG 2000 image → (w, h, luma)."""
    data = bytes(data)
    cs = _find_codestream(data)
    if len(cs) < 4 or int.from_bytes(cs[:2], "big") != _MARK_SOC:
        raise JP2Error("missing SOC")
    pos = 2
    width = height = None
    levels = cb_w = cb_h = None
    guard, eps = None, None
    tile = None
    while pos + 2 <= len(cs):
        marker = int.from_bytes(cs[pos:pos + 2], "big")
        pos += 2
        if marker == _MARK_EOC:
            break
        if marker == _MARK_SOD:
            raise JP2Error("SOD before SOT")
        if pos + 2 > len(cs):
            raise JP2Error("truncated marker segment")
        seglen = int.from_bytes(cs[pos:pos + 2], "big")
        if seglen < 2 or pos + seglen > len(cs):
            raise JP2Error("bad marker segment length")
        body = cs[pos + 2:pos + seglen]
        pos += seglen
        if marker == _MARK_SIZ:
            if len(body) < 36:
                raise JP2Error("short SIZ")
            width = int.from_bytes(body[2:6], "big")
            height = int.from_bytes(body[6:10], "big")
            xo = int.from_bytes(body[10:14], "big")
            yo = int.from_bytes(body[14:18], "big")
            xt = int.from_bytes(body[18:22], "big")
            yt = int.from_bytes(body[22:26], "big")
            ncomp = int.from_bytes(body[34:36], "big")
            if ncomp != 1:
                raise JP2Error(f"unsupported component count {ncomp}")
            if xo or yo or xt < width or yt < height:
                raise JP2Error("unsupported tiling/origin")
            if len(body) < 39:
                raise JP2Error("short SIZ component spec")
            if body[36] != 7 or body[37] != 1 or body[38] != 1:
                raise JP2Error("unsupported component depth/subsampling")
            if not (0 < width <= 1 << 20 and 0 < height <= 1 << 20):
                raise JP2Error("unreasonable image dimensions")
        elif marker == _MARK_COD:
            if len(body) < 10:
                raise JP2Error("short COD")
            if body[0] != 0:
                raise JP2Error("precinct partitions unsupported")
            if body[1] != 0:
                raise JP2Error("only LRCP progression supported")
            if int.from_bytes(body[2:4], "big") != 1:
                raise JP2Error("only single-layer streams supported")
            levels = body[5]
            if levels > 8:
                raise JP2Error("too many decomposition levels")
            cb_w = 1 << (body[6] + 2)
            cb_h = 1 << (body[7] + 2)
            if cb_w * cb_h > 4096 or cb_w > 1024 or cb_h > 1024:
                raise JP2Error("illegal codeblock dims")
            if body[8] != 0:
                raise JP2Error("codeblock style flags unsupported")
            if body[9] != 1:
                raise JP2Error("only the reversible 5/3 transform supported")
        elif marker == _MARK_QCD:
            if not body:
                raise JP2Error("short QCD")
            if body[0] & 0x1F:
                raise JP2Error("quantization unsupported (reversible only)")
            guard = body[0] >> 5
            eps = [b >> 3 for b in body[1:]]
        elif marker == _MARK_SOT:
            if len(body) < 8:
                raise JP2Error("short SOT")
            if int.from_bytes(body[0:2], "big") != 0:
                raise JP2Error("multiple tiles unsupported")
            psot = int.from_bytes(body[2:6], "big")
            if pos + 2 > len(cs) or int.from_bytes(cs[pos:pos + 2],
                                                   "big") != _MARK_SOD:
                raise JP2Error("SOT not followed by SOD")
            start = pos + 2
            if psot == 0:
                end = len(cs) - 2 if cs[-2:] == b"\xff\xd9" else len(cs)
            else:
                end = start + psot - 14
            if end > len(cs) or end < start:
                raise JP2Error("tile length out of range")
            tile = cs[start:end]
            pos = end
    if width is None or levels is None or eps is None or tile is None:
        raise JP2Error("missing SIZ/COD/QCD/tile")
    layout = _band_dims(width, height, levels)
    if sum(len(r) for r in layout) != len(eps):
        raise JP2Error("QCD subband count mismatch")
    mbs = iter(e + guard - 1 for e in eps)
    pos2 = 0
    res_bands = []
    for res_layout in layout:
        pos2, bands = _decode_packet(tile, pos2, res_layout, mbs, cb_w, cb_h)
        res_bands.append(bands)
    # inverse DWT
    def _arr(entry):
        orient, bwid, bh, coefs = entry
        if coefs is None:
            return _np.zeros((bh, bwid), dtype=_np.int64)
        return coefs
    ll = _arr(res_bands[0][0])
    for r in range(1, levels + 1):
        hl, lh, hh = (_arr(e) for e in res_bands[r])
        ll = _inv53_2d(ll, hl, lh, hh)
    if ll.shape != (height, width):
        raise JP2Error("reconstruction shape mismatch")
    out = _np.clip(ll + 128, 0, 255).astype(_np.uint8)
    return width, height, out.tobytes()

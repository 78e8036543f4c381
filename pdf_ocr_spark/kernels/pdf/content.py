"""Content-stream interpreter: executes the text/graphics operators of a
page and emits positioned unicode glyphs.

From-scratch replacement for PyMuPDF's ``page.get_text("dict")``
(/root/reference/pdf_ocr_with_boxes_v4.py:56-68).  Tracks the full state
the sample PDF needs (SURVEY.md §5.2: 448 BT blocks, per-glyph hex Tj,
944 TD advances, 448 Tm, top-of-page y-flip cm): CTM with q/Q stack,
Tm/Tlm, Tf/Tc/Tw/Tz/TL/Ts, Tj/TJ/'/" with correct advances from font
widths, Form XObject recursion, inline-image skip, image XObject capture
for the OCR branch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

from pdf_ocr_spark.kernels.pdf.cos import (
    Lexer,
    Name,
    PDFDocument,
    PDFError,
    Ref,
    Stream,
)
from pdf_ocr_spark.kernels.pdf.fonts import Font, load_page_fonts

Matrix = Tuple[float, float, float, float, float, float]
IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def mat_mul(a: Matrix, b: Matrix) -> Matrix:
    """a × b (PDF row-vector convention: point' = point · a · b)."""
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


def mat_apply(m: Matrix, x: float, y: float) -> Tuple[float, float]:
    return (m[0] * x + m[2] * y + m[4], m[1] * x + m[3] * y + m[5])


class Glyph(NamedTuple):
    """One positioned glyph in device space."""

    text: str      # unicode (may be multi-char for ligature expansions, '' if unmapped)
    x: float       # device-space pen position
    y: float
    adv: float     # device-space advance width
    size: float    # device-space font size (vertical extent estimate)
    font: str      # resource name, for debugging
    seq: int       # emission order (deterministic tiebreak)


class PageResult(NamedTuple):
    glyphs: List[Glyph]
    width: float
    height: float
    images: List[bytes]  # raw encoded bytes of image XObjects drawn on the page
    n_text_ops: int


class _TextState:
    __slots__ = ("font", "size", "char_sp", "word_sp", "hscale", "leading", "rise")

    def __init__(self) -> None:
        self.font: Optional[Font] = None
        self.size = 0.0
        self.char_sp = 0.0
        self.word_sp = 0.0
        self.hscale = 1.0
        self.leading = 0.0
        self.rise = 0.0

    def clone(self) -> "_TextState":
        t = _TextState()
        t.font, t.size, t.char_sp = self.font, self.size, self.char_sp
        t.word_sp, t.hscale, t.leading, t.rise = (
            self.word_sp,
            self.hscale,
            self.leading,
            self.rise,
        )
        return t


_OPERATOR_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _tokenize_content(data: bytes):
    """Yield (operands, operator) tuples from a content stream.

    Tolerant: an operand/operator that fails to lex is skipped and the
    scan resumes at the next token boundary (crawled PDFs are dirty)."""
    lex = Lexer(data, 0)
    operands: List[Any] = []
    n = len(data)
    while True:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = lex.peek()
        ch = bytes((c,))
        if ch in b"/<([+-.0123456789":
            try:
                operands.append(lex.parse_object())
            except PDFError:
                lex.pos += 1
                operands = []
            continue
        m = _OPERATOR_RE.match(data, lex.pos)
        if not m:
            lex.pos += 1
            operands = []
            continue
        op = m.group()
        lex.pos = m.end()
        if op == b"BI":
            # inline image: skip to EI at a whitespace boundary
            idx = lex.pos
            while True:
                idx = data.find(b"EI", idx)
                if idx < 0:
                    lex.pos = n
                    break
                before = data[idx - 1 : idx]
                after = data[idx + 2 : idx + 3]
                if (not before or before in b"\x00\t\n\x0c\r ") and (
                    not after or after in b"\x00\t\n\x0c\r /[<("
                ):
                    lex.pos = idx + 2
                    break
                idx += 2
            operands = []
            continue
        if op in (b"true", b"false", b"null"):
            operands.append(op == b"true")
            continue
        yield operands, op
        operands = []


class ContentInterpreter:
    """Executes one page's content, accumulating glyphs and image refs."""

    MAX_GLYPHS = 500_000  # hard cap: poison-doc protection at 100 TB scale

    def __init__(self, doc: PDFDocument, page: Dict[str, Any]):
        self.doc = doc
        self.page = page
        media = [float(doc.resolve(v)) for v in (doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
        self.page_w = abs(media[2] - media[0])
        self.page_h = abs(media[3] - media[1])
        self.origin_x, self.origin_y = min(media[0], media[2]), min(media[1], media[3])
        self.glyphs: List[Glyph] = []
        self.images: List[bytes] = []
        self.n_text_ops = 0
        self._seq = 0
        self._xobj_depth = 0

    # -- public ------------------------------------------------------------

    def run(self) -> PageResult:
        content = self.doc.page_content(self.page)
        fonts = load_page_fonts(self.doc, self.page.get("Resources"))
        resources = self.doc.resolve(self.page.get("Resources")) or {}
        self._execute(content, fonts, resources, IDENTITY)
        return PageResult(
            self.glyphs, self.page_w, self.page_h, self.images, self.n_text_ops
        )

    # -- execution ---------------------------------------------------------

    def _execute(
        self,
        content: bytes,
        fonts: Dict[str, Font],
        resources: Dict[str, Any],
        base_ctm: Matrix,
    ) -> None:
        doc = self.doc
        ctm = base_ctm
        gs_stack: List[Tuple[Matrix, _TextState]] = []
        ts = _TextState()
        tm: Matrix = IDENTITY
        tlm: Matrix = IDENTITY
        in_text = False

        def num(v: Any, default: float = 0.0) -> float:
            return float(v) if isinstance(v, (int, float)) else default

        for operands, op in _tokenize_content(content):
            if len(self.glyphs) >= self.MAX_GLYPHS:
                return
            try:
                if op == b"q":
                    gs_stack.append((ctm, ts.clone()))
                elif op == b"Q":
                    if gs_stack:
                        ctm, ts = gs_stack.pop()
                elif op == b"cm" and len(operands) >= 6:
                    m = tuple(num(v) for v in operands[-6:])
                    ctm = mat_mul(m, ctm)  # type: ignore[arg-type]
                elif op == b"BT":
                    in_text = True
                    tm = tlm = IDENTITY
                elif op == b"ET":
                    in_text = False
                elif op == b"Tf" and len(operands) >= 2:
                    fname = str(operands[-2]) if isinstance(operands[-2], (Name, str)) else ""
                    ts.font = fonts.get(fname)
                    ts.size = num(operands[-1])
                elif op == b"Tc" and operands:
                    ts.char_sp = num(operands[-1])
                elif op == b"Tw" and operands:
                    ts.word_sp = num(operands[-1])
                elif op == b"Tz" and operands:
                    ts.hscale = num(operands[-1], 100.0) / 100.0
                elif op == b"TL" and operands:
                    ts.leading = num(operands[-1])
                elif op == b"Ts" and operands:
                    ts.rise = num(operands[-1])
                elif op == b"Td" and len(operands) >= 2:
                    tlm = mat_mul(
                        (1, 0, 0, 1, num(operands[-2]), num(operands[-1])), tlm
                    )
                    tm = tlm
                elif op == b"TD" and len(operands) >= 2:
                    ts.leading = -num(operands[-1])
                    tlm = mat_mul(
                        (1, 0, 0, 1, num(operands[-2]), num(operands[-1])), tlm
                    )
                    tm = tlm
                elif op == b"Tm" and len(operands) >= 6:
                    tlm = tuple(num(v) for v in operands[-6:])  # type: ignore[assignment]
                    tm = tlm
                elif op == b"T*":
                    tlm = mat_mul((1, 0, 0, 1, 0, -ts.leading), tlm)
                    tm = tlm
                elif op == b"Tj" and operands:
                    tm = self._show(operands[-1], ts, tm, ctm)
                elif op == b"'" and operands:
                    tlm = mat_mul((1, 0, 0, 1, 0, -ts.leading), tlm)
                    tm = tlm
                    tm = self._show(operands[-1], ts, tm, ctm)
                elif op == b'"' and len(operands) >= 3:
                    ts.word_sp = num(operands[-3])
                    ts.char_sp = num(operands[-2])
                    tlm = mat_mul((1, 0, 0, 1, 0, -ts.leading), tlm)
                    tm = tlm
                    tm = self._show(operands[-1], ts, tm, ctm)
                elif op == b"TJ" and operands and isinstance(operands[-1], list):
                    for item in operands[-1]:
                        if isinstance(item, bytes):
                            tm = self._show(item, ts, tm, ctm)
                        elif isinstance(item, (int, float)):
                            tx = -float(item) / 1000.0 * ts.size * ts.hscale
                            tm = mat_mul((1, 0, 0, 1, tx, 0), tm)
                elif op == b"Do" and operands:
                    self._do_xobject(operands[-1], resources, ctm, fonts)
            except PDFError:
                continue  # skip malformed op, keep going

    def _show(self, raw: Any, ts: _TextState, tm: Matrix, ctm: Matrix) -> Matrix:
        if not isinstance(raw, bytes) or ts.font is None or ts.size == 0:
            return tm
        self.n_text_ops += 1
        font = ts.font
        trm = mat_mul(tm, ctm)
        # device-space font size: length of the (0, size) vector under trm
        sy = (trm[2] ** 2 + trm[3] ** 2) ** 0.5 * ts.size
        for code, uni, w1000 in font.decode(raw):
            # pen position in device space (account for rise)
            dx, dy = mat_apply(mat_mul(tm, ctm), 0.0, ts.rise)
            w_text = (w1000 / 1000.0) * ts.size
            extra = ts.char_sp
            if (
                not font.two_byte
                and code == 32
                and ts.word_sp
            ):
                extra += ts.word_sp
            tx = (w_text + extra) * ts.hscale
            # device-space advance: transformed length of (tx, 0)
            ax, ay = trm[0] * tx, trm[1] * tx
            adv = (ax * ax + ay * ay) ** 0.5
            self.glyphs.append(
                Glyph(uni, dx - self.origin_x, dy - self.origin_y, adv, sy, font.name, self._seq)
            )
            self._seq += 1
            tm = mat_mul((1, 0, 0, 1, tx, 0), tm)
        return tm

    def _do_xobject(
        self,
        name: Any,
        resources: Dict[str, Any],
        ctm: Matrix,
        parent_fonts: Dict[str, Font],
    ) -> None:
        if self._xobj_depth >= 8:
            return
        res = self.doc.resolve(resources)
        xobjs = self.doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
        if not isinstance(xobjs, dict):
            return
        xo = self.doc.resolve(xobjs.get(str(name)))
        if not isinstance(xo, Stream):
            return
        subtype = str(self.doc.resolve(xo.dict.get("Subtype", "")))
        if subtype == "Image":
            self.images.append(xo.raw)
            return
        if subtype == "Form":
            inner_res = self.doc.resolve(xo.dict.get("Resources")) or res
            inner_fonts = load_page_fonts(self.doc, inner_res) or parent_fonts
            mtx = self.doc.resolve(xo.dict.get("Matrix"))
            m: Matrix = IDENTITY
            if isinstance(mtx, list) and len(mtx) >= 6:
                m = tuple(float(self.doc.resolve(v)) for v in mtx[:6])  # type: ignore[assignment]
            self._xobj_depth += 1
            try:
                self._execute(
                    xo.decode(self.doc),
                    inner_fonts,
                    inner_res if isinstance(inner_res, dict) else {},
                    mat_mul(m, ctm),
                )
            except PDFError:
                pass
            finally:
                self._xobj_depth -= 1


def interpret_page(doc: PDFDocument, page: Dict[str, Any]) -> PageResult:
    return ContentInterpreter(doc, page).run()
